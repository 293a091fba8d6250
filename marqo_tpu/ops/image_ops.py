"""On-device image preprocessing for CLIP-family vision towers.

BASELINE.json north star: the reference's preprocessing chain (decode →
EXIF orient → resize → center-crop → normalize, torchvision Compose inside
clip_utils.py) runs on CPU per image; here decode+EXIF happen once on host
(PIL) producing a uint8 RGB array, and resize/crop/normalize/patch-embed are
XLA ops inside the encoder's jit — pixels cross host→HBM exactly once as
uint8 (3 bytes/px instead of 12 for fp32).

Resize parity: CLIP uses bicubic resize; ``jax.image.resize`` implements
the same Keys cubic kernel as PIL/torchvision antialias bicubic.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants (also used by open_clip defaults)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_shorter_side(image: jax.Array, target: int) -> jax.Array:
    """Resize so the shorter side equals ``target`` (aspect preserved).
    NOTE: output shape depends on input shape; callers that jit should use
    fixed-size inputs or the combined `preprocess_image` below with static
    input shapes."""
    h, w = image.shape[0], image.shape[1]
    if h <= w:
        new_h, new_w = target, max(1, int(round(w * target / h)))
    else:
        new_h, new_w = max(1, int(round(h * target / w))), target
    return jax.image.resize(image, (new_h, new_w, image.shape[2]),
                            method="bicubic", antialias=True)


def center_crop(image: jax.Array, size: int) -> jax.Array:
    h, w = image.shape[0], image.shape[1]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return image[top:top + size, left:left + size, :]


def normalize(image_f32: jax.Array,
              mean: Tuple[float, ...] = CLIP_MEAN,
              std: Tuple[float, ...] = CLIP_STD) -> jax.Array:
    mean_arr = jnp.asarray(mean, dtype=image_f32.dtype)
    std_arr = jnp.asarray(std, dtype=image_f32.dtype)
    return (image_f32 - mean_arr) / std_arr


def preprocess_image(image_u8: jax.Array, image_size: int,
                     mean: Tuple[float, ...] = CLIP_MEAN,
                     std: Tuple[float, ...] = CLIP_STD) -> jax.Array:
    """uint8 (H, W, 3) → normalized float (size, size, 3). Fully traceable;
    shapes are static per (H, W) bucket."""
    x = image_u8.astype(jnp.float32) / 255.0
    x = resize_shorter_side(x, image_size)
    x = center_crop(x, image_size)
    return normalize(x, mean, std)


def preprocess_batch(images_u8: jax.Array, image_size: int,
                     mean: Tuple[float, ...] = CLIP_MEAN,
                     std: Tuple[float, ...] = CLIP_STD) -> jax.Array:
    """(B, H, W, 3) uint8 → (B, size, size, 3) normalized float32."""
    return jax.vmap(lambda im: preprocess_image(im, image_size, mean, std))(
        images_u8)


def host_decode(content) -> np.ndarray:
    """Host-side decode + EXIF orientation → uint8 RGB ndarray.

    Accepts PIL images, file paths, raw bytes, or ndarrays (parity:
    reference clip_utils.py:130-218 format handling; network download lives
    in tensor_search/add_docs.py)."""
    from PIL import Image, ImageOps
    import io

    if isinstance(content, np.ndarray):
        if content.dtype != np.uint8:
            raise ValueError("ndarray images must be uint8 RGB")
        return content
    if isinstance(content, bytes):
        img = Image.open(io.BytesIO(content))
    elif isinstance(content, str):
        img = Image.open(content)
    elif isinstance(content, Image.Image):
        img = content
    else:
        raise ValueError(f"Unsupported image content type {type(content)}")
    img = ImageOps.exif_transpose(img)
    return np.asarray(img.convert("RGB"), dtype=np.uint8)
