"""Image patching ("patch models"): split images into sub-image chunks.

Parity: reference src/marqo/s2_inference/processing/image.py:46 chunk_image
— methods: simple grid, overlap; dino-v1/dino-v2/frcnn/marqo-yolo are
attention/detector-based patchers that need extra ONNX/torch weights — they
raise a clear unavailable error offline (same failure mode as the reference
without its model downloads). Each patch becomes one chunk+vector; the
bounding box string is the stored chunk (reference behavior: chunk text is
the bbox repr, the highlight shows it).
"""

from typing import List, Tuple

import numpy as np

from marqo_tpu.core.exceptions import InvalidArgumentError


def _grid_boxes(width: int, height: int, splits: int = 3,
                overlap: bool = False) -> List[Tuple[int, int, int, int]]:
    """splits×splits grid (reference simple method uses a 3×3 grid over the
    image plus the full image); with ``overlap``, half-stride shifted boxes
    are added."""
    boxes = [(0, 0, width, height)]
    cell_w, cell_h = width / splits, height / splits
    for i in range(splits):
        for j in range(splits):
            boxes.append((int(j * cell_w), int(i * cell_h),
                          int((j + 1) * cell_w), int((i + 1) * cell_h)))
    if overlap:
        for i in range(splits - 1):
            for j in range(splits - 1):
                boxes.append((int((j + 0.5) * cell_w), int((i + 0.5) * cell_h),
                              int((j + 1.5) * cell_w), int((i + 1.5) * cell_h)))
    # dedup, preserve order
    seen = set()
    out = []
    for b in boxes:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out


def chunk_image(image: np.ndarray, method: str
                ) -> Tuple[List[np.ndarray], List[str]]:
    """image: uint8 (H, W, 3) → (patches, bbox-string chunks).

    method ∈ {simple, overlap}; detector/attention methods raise offline.
    """
    if image.ndim != 3 or image.shape[2] != 3:
        raise InvalidArgumentError("chunk_image expects an (H, W, 3) image")
    height, width = image.shape[0], image.shape[1]
    if method in ("simple", "overlap"):
        boxes = _grid_boxes(width, height, splits=3,
                            overlap=(method == "overlap"))
    elif method in ("frcnn", "dino-v1", "dino-v2", "marqo-yolo", "yolox"):
        raise InvalidArgumentError(
            f"Patch method `{method}` requires detector/attention model "
            f"weights that are not available in this deployment. Use "
            f"`simple` or `overlap`.")
    else:
        raise InvalidArgumentError(
            f"Unknown patch method `{method}`. Available: simple, overlap")
    patches = [image[top:bottom, left:right]
               for (left, top, right, bottom) in boxes]
    chunks = [str(list(box)) for box in boxes]
    return patches, chunks
