"""Image search with localization (bounding-box highlights).

Mirrors /root/reference/examples/ImageSearchLocalization/index_all_data.py:
index the same images under DIFFERENT patch methods (none / simple /
dino-v1 / yolox) and compare how each localizes a query — the winning
chunk's bbox comes back as the hit's highlight, in original-image pixels.

Runs fully offline: synthetic images with distinct colored regions, a
random-init CLIP (reference uses ViT-B/32; swap MODEL_PROPS for the
registry name when hub access exists), and random-init detector patchers
(MARQO_PATCH_MODELS_RANDOM_INIT) — box GEOMETRY is real (grid/Otsu/
decode pipelines), detector SEMANTICS are synthetic.

Usage: python examples/image_localization.py [--cpu]
"""

import ast
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("MARQO_PATCH_MODELS_RANDOM_INIT", "TRUE")

from PIL import Image, ImageDraw

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.tensor_search import tensor_search

MODEL_PROPS = {
    "type": "clip", "dimensions": 64, "random_init": True,
    "image_size": 64, "architecture": {"patch_size": 16},
}

PATCH_METHODS = [None, "simple", "dino-v1", "marqo-yolo"]


def make_images(out_dir: str):
    """Images with a distinct object region (reference downloads a
    product-image set; we synthesize)."""
    paths = []
    scenes = [
        ("red-box-top-left", (255, 40, 40), (10, 10, 80, 80)),
        ("green-box-center", (40, 255, 40), (90, 70, 170, 150)),
        ("blue-box-bottom", (40, 40, 255), (60, 140, 180, 200)),
    ]
    for name, color, box in scenes:
        img = Image.new("RGB", (224, 224), color=(245, 245, 245))
        ImageDraw.Draw(img).rectangle(box, fill=color)
        path = os.path.join(out_dir, f"{name}.png")
        img.save(path)
        paths.append(path)
    return paths


def main():
    cfg = Config()
    cfg.index_management.bootstrap()
    with tempfile.TemporaryDirectory() as tmp:
        images = make_images(tmp)
        for method in PATCH_METHODS:
            index_name = f"visual-search-{method or 'none'}".replace(
                "/", "-")
            cfg.index_management.create_index(IndexSettings(
                model="vis-clip", modelProperties=MODEL_PROPS,
                treatUrlsAndPointersAsImages=True,
                imagePreprocessing=(
                    {"patchMethod": method} if method else {}),
            ).to_marqo_index(index_name))
            cfg.index_meta_cache.populate()
            res = tensor_search.add_documents(cfg, AddDocsParams(
                index_name=index_name,
                docs=[{"_id": os.path.basename(p), "image_location": p}
                      for p in images],
                tensor_fields=["image_location"]))
            assert res["errors"] is False, res["items"]

            hits = tensor_search.search(
                cfg, index_name, text="a red box", limit=3)["hits"]
            print(f"\npatch_method={method or 'none'}:")
            for hit in hits:
                highlight = hit["_highlights"][0]["image_location"]
                # patched indexes localize: the highlight is a bbox
                # string "[l, t, r, b]"; unpatched return the pointer
                try:
                    box = ast.literal_eval(highlight)
                    where = f"bbox={box}"
                except (ValueError, SyntaxError):
                    where = "whole image"
                print(f"  {hit['_id']:<22} score={hit['_score']:.3f} "
                      f"{where}")
    print("\ndone")


if __name__ == "__main__":
    main()
