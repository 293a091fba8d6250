"""Image search walkthrough (reference examples/ImageSearchGuide, adapted
to run fully offline with generated images + a random-init CLIP).

With hub access, set MODEL = "ViT-B/32" and drop modelProperties for real
OpenAI CLIP weights.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from PIL import Image

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search

CLIP_PROPS = {"type": "clip", "dimensions": 64, "random_init": True,
              "image_size": 64, "architecture": {"patch_size": 16}}


def make_images(tmpdir):
    paths = {}
    for name, color in [("crimson", (220, 20, 60)), ("teal", (0, 128, 128)),
                        ("gold", (255, 215, 0))]:
        path = os.path.join(tmpdir, f"{name}.png")
        Image.new("RGB", (320, 240), color=color).save(path)
        paths[name] = path
    return paths


def main():
    config = Config()
    config.index_management.bootstrap()
    settings = IndexSettings(model="my-clip", modelProperties=CLIP_PROPS,
                             treatUrlsAndPointersAsImages=True,
                             treatUrlsAndPointersAsMedia=True)
    config.index_management.create_index(settings.to_marqo_index("image-index"))
    config.index_meta_cache.populate()

    with tempfile.TemporaryDirectory() as tmpdir:
        images = make_images(tmpdir)
        docs = [{"_id": name, "image": path, "caption": f"a {name} swatch"}
                for name, path in images.items()]
        result = tensor_search.add_documents(config, AddDocsParams(
            index_name="image-index", docs=docs,
            tensor_fields=["image", "caption"]))
        assert not result["errors"], result["items"]

        # search by image: find the most similar swatch
        res = tensor_search.search(config, "image-index",
                                   text=images["crimson"])
        print("query: crimson.png →",
              [(h["_id"], round(h["_score"], 3)) for h in res["hits"]])

        # weighted image+text query
        res = tensor_search.search(
            config, "image-index",
            text={images["teal"]: 1.0, "gold swatch": 0.3})
        print("weighted image+text →",
              [(h["_id"], round(h["_score"], 3)) for h in res["hits"]])

        # multimodal combination field
        tensor_search.add_documents(config, AddDocsParams(
            index_name="image-index",
            docs=[{"_id": "combo", "pic": images["gold"],
                   "text": "golden hour"}],
            tensor_fields=["combined"],
            mappings={"combined": {"type": "multimodal_combination",
                                   "weights": {"pic": 0.7, "text": 0.3}}}))
        print("multimodal combination doc indexed ✓")


if __name__ == "__main__":
    main()
