"""Multimodal e-commerce search walkthrough (BASELINE.md config 3).

Mirrors /root/reference/examples/MultiModalSearch/index_and_search.py —
the open_clip ViT-L/14 weighted multimodal-combination scenario:

  1. image index on a ViT-L/14-shaped CLIP
  2. plain + "searching as prompting" text queries
  3. weighted multi-term queries with NEGATION
  4. score modifiers (rank by aesthetic_score)
  5. multimodal-combination documents with two different weight profiles
  6. context-vector search using embeddings read back via expose_facets

Runs fully offline: images are generated locally and the CLIP is
random-init at the real ViT-L/14 architecture (reference model
"open_clip/ViT-L-14/laion2b_s32b_b82k"; no hub egress here, so weights are
synthetic — rankings are architecture-real but not semantically
meaningful). With hub access, swap MODEL/MODEL_PROPS for the registry
name. Pass --small for a tiny CLIP when iterating on 1 CPU core.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    # force the CPU backend (e.g. when the TPU tunnel is unavailable);
    # must happen before any jax-importing module loads
    import jax
    jax.config.update("jax_platforms", "cpu")

from PIL import Image

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search

VIT_L_14_PROPS = {
    # real ViT-L/14 architecture (open_clip laion2b_s32b_b82k shapes)
    "type": "clip", "dimensions": 768, "image_size": 224,
    "random_init": True,
    "architecture": {
        "patch_size": 14, "vision_hidden_size": 1024, "vision_layers": 24,
        "vision_heads": 16, "vision_intermediate": 4096,
        "text_hidden_size": 768, "text_layers": 12, "text_heads": 12,
        "text_intermediate": 3072,
    },
}

SMALL_PROPS = {
    "type": "clip", "dimensions": 64, "image_size": 64, "random_init": True,
    "architecture": {"patch_size": 16},
}

PRODUCTS = [
    ("green-shirt", (34, 139, 34), "green cotton shirt", 12.5, 0.81),
    ("red-sweater", (178, 34, 34), "cozy red sweater, festive", 39.0, 0.93),
    ("blue-jeans", (70, 90, 180), "stonewash blue jeans", 59.0, 0.64),
    ("gold-scarf", (218, 165, 32), "gold holiday scarf", 19.0, 0.88),
]


def make_images(tmpdir):
    paths = {}
    for name, color, *_ in PRODUCTS:
        path = os.path.join(tmpdir, f"{name}.png")
        Image.new("RGB", (224, 224), color=color).save(path)
        paths[name] = path
    return paths


def show(label, res):
    print(f"{label}: " + ", ".join(
        f"{h['_id']}({h['_score']:.3f})" for h in res["hits"]))


def main():
    small = "--small" in sys.argv
    props = SMALL_PROPS if small else VIT_L_14_PROPS

    config = Config()
    config.index_management.bootstrap()
    settings = IndexSettings(
        model="vit-l-14-demo" if not small else "clip-small-demo",
        modelProperties=props,
        treatUrlsAndPointersAsImages=True,
        treatUrlsAndPointersAsMedia=True,
        normalizeEmbeddings=True)
    config.index_management.create_index(
        settings.to_marqo_index("multimodal"))
    config.index_meta_cache.populate()

    with tempfile.TemporaryDirectory() as tmpdir:
        images = make_images(tmpdir)

        # -- 1. index image products (image is the only tensor field, like
        #       the reference's s3_http) -------------------------------------
        docs = [{"_id": name, "image": images[name], "caption": caption,
                 "price": price, "aesthetic_score": score}
                for name, _, caption, price, score in PRODUCTS]
        result = tensor_search.add_documents(config, AddDocsParams(
            index_name="multimodal", docs=docs, tensor_fields=["image"]))
        assert not result["errors"], result["items"]
        print(f"indexed {len(docs)} products")

        # -- 2. plain query + searching-as-prompting ------------------------
        show("query 'green shirt'", tensor_search.search(
            config, "multimodal", text="green shirt", limit=4))
        show("prompted query", tensor_search.search(
            config, "multimodal",
            text="cozy sweater, xmas, festive, holidays", limit=4))

        # -- 3. weighted query with negation --------------------------------
        show("negated query", tensor_search.search(
            config, "multimodal",
            text={"green shirt": 1.0, "denim, jeans": -0.6}, limit=4))

        # -- 4. score modifiers: boost by aesthetic score -------------------
        res = tensor_search.search(
            config, "multimodal", text="clothing", limit=4,
            score_modifiers={"add_to_score": [
                {"field_name": "aesthetic_score", "weight": 0.2}]})
        show("aesthetic-ranked", res)
        agg = sum(h["aesthetic_score"] for h in res["hits"])
        print(f"  aggregate aesthetic score: {agg:.2f}")

        # -- 5. multimodal combinations with two weight profiles ------------
        combo_docs = [
            {"_id": "combo-top-heavy",
             "top_1": images["green-shirt"], "top_2": images["red-sweater"],
             "top_3": images["blue-jeans"], "top_4": images["gold-scarf"]},
            {"_id": "combo-uniform",
             "top_1": images["green-shirt"], "top_2": images["red-sweater"],
             "top_3": images["blue-jeans"], "top_4": images["gold-scarf"]},
        ]
        mappings1 = {"multimodal": {"type": "multimodal_combination",
                                    "weights": {"top_1": 0.40, "top_2": 0.30,
                                                "top_3": 0.20,
                                                "top_4": 0.10}}}
        mappings2 = {"multimodal": {"type": "multimodal_combination",
                                    "weights": {"top_1": 0.25, "top_2": 0.25,
                                                "top_3": 0.25,
                                                "top_4": 0.25}}}
        for doc, mappings in [(combo_docs[0], mappings1),
                              (combo_docs[1], mappings2)]:
            result = tensor_search.add_documents(config, AddDocsParams(
                index_name="multimodal", docs=[doc],
                tensor_fields=["multimodal"], mappings=mappings))
            assert not result["errors"], result["items"]
        print("indexed 2 multimodal-combination outfits")

        # -- 6. context-vector search from exposed facets -------------------
        facets = {}
        for _id in ("combo-top-heavy", "combo-uniform"):
            doc = tensor_search.get_document_by_id(
                config, "multimodal", _id, show_vectors=True)
            facets[_id] = doc["_tensor_facets"][0]["_embedding"]
        for _id, vec in facets.items():
            res = tensor_search.search(
                config, "multimodal",
                text={"green shirt": 1.0},
                context={"tensor": [{"vector": vec, "weight": 0.5}]},
                limit=4)
            show(f"context={_id}", res)

    print("done")


if __name__ == "__main__":
    main()
