"""DINO self-supervised ViT in functional JAX — attention-map patching.

Parity: the reference's dino-v1/dino-v2 patch methods run facebookresearch
/dino ViTs and read the LAST block's CLS→patch self-attention per head
(reference DINO_utils.py:87-126 DINO_inference / model.get_last_selfattention;
PatchifyViT, processing/image.py:314-377). The maps are upsampled to pixel
space and thresholded into class-less bounding boxes downstream
(inference/image_patching.py).

Architecture: standard pre-LN ViT (patch conv → CLS + learned positions →
blocks → final LN), gelu MLP. The towers reuse models/clip.py's scanned
pre-LN blocks for layers 1..L-1; the last block runs inline so the
attention probabilities can be returned (lax.scan can't expose one
layer's internals).

Checkpoints: facebookresearch/dino naming (`blocks.N.attn.qkv` packed,
`patch_embed.proj`, `cls_token`, `pos_embed`); random-init for tests.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.models.clip import _run_blocks
from marqo_tpu.ops.common import layer_norm

# torchvision ImageNet normalization (reference DINO_utils.py:77-79)
DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class DinoViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 384       # vit_small
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def intermediate_size(self) -> int:
        return self.hidden_size * self.mlp_ratio

    @staticmethod
    def vit_small(patch_size: int = 16) -> "DinoViTConfig":
        return DinoViTConfig(patch_size=patch_size)

    @staticmethod
    def vit_base(patch_size: int = 16) -> "DinoViTConfig":
        return DinoViTConfig(patch_size=patch_size, hidden_size=768,
                             num_heads=12)


def init_params(config: DinoViTConfig, rng, dtype=jnp.float32) -> dict:
    from marqo_tpu.models.clip import _init_blocks
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    H = config.hidden_size
    n_patches = (config.image_size // config.patch_size) ** 2
    std = 0.02
    return {
        "patch_embedding": (jax.random.normal(
            k0, (config.patch_size ** 2 * 3, H)) * std).astype(dtype),
        "patch_bias": jnp.zeros((H,), dtype),
        "cls_token": (jax.random.normal(k1, (H,)) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            k2, (n_patches + 1, H)) * std).astype(dtype),
        "layers": _init_blocks(k3, config.num_layers, H,
                               config.intermediate_size, dtype),
        "final_ln_scale": jnp.ones((H,), dtype),
        "final_ln_bias": jnp.zeros((H,), dtype),
    }


def last_selfattention(params: dict, pixels_u8: jax.Array,
                       config: DinoViTConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, num_heads, n_side, n_side) fp32: the
    last block's CLS→patch attention per head, reshaped to the patch grid
    (reference DINO_inference keeps attentions[0, :, 0, 1:])."""
    B = pixels_u8.shape[0]
    size, patch = config.image_size, config.patch_size
    n_side = size // patch
    H, N = config.hidden_size, config.num_heads
    D = H // N

    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(DINO_MEAN)) / jnp.asarray(DINO_STD)
    x = x.reshape(B, n_side, patch, n_side, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_side * n_side,
                                              patch * patch * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x,
                   params["patch_embedding"].astype(compute_dtype))
    x = x + params["patch_bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype),
                           (B, 1, H))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(compute_dtype)[None]

    layers = jax.tree.map(lambda a: a.astype(compute_dtype),
                          params["layers"])
    head = jax.tree.map(lambda a: a[:-1], layers)
    last = jax.tree.map(lambda a: a[-1], layers)
    x = _run_blocks(x, head, N, "gelu", config.layer_norm_eps)

    # final block, attention exposed
    h = layer_norm(x, last["ln1_scale"], last["ln1_bias"],
                   config.layer_norm_eps)
    S = h.shape[1]

    def proj(w, b):
        return (jnp.einsum("bsh,hd->bsd", h, w) + b).reshape(
            B, S, N, D).transpose(0, 2, 1, 3)

    q = proj(last["q_w"], last["q_b"])
    k = proj(last["k_w"], last["k_b"])
    scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
    scores = (jnp.einsum("bnsd,bntd->bnst", q, k) * scale).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    cls_attn = probs[:, :, 0, 1:]  # CLS row, patch columns
    return cls_attn.reshape(B, N, n_side, n_side)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def last_selfattention_jit(params, pixels_u8, config,
                           compute_dtype=jnp.bfloat16):
    return last_selfattention(params, pixels_u8, config, compute_dtype)


def params_from_dino_state_dict(state_dict, config: DinoViTConfig,
                                dtype=jnp.float32) -> dict:
    """Convert a facebookresearch/dino ViT state dict (packed qkv)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    H = config.hidden_size
    L = config.num_layers

    conv = sd["patch_embed.proj.weight"]  # (H, 3, p, p)
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, H)

    def stack(fmt, transpose=False, split=None):
        arrs = []
        for i in range(L):
            a = sd[fmt.format(i=i)]
            if split is not None:  # packed qkv: rows [q; k; v]
                a = np.split(a, 3, axis=0)[split]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    p = "blocks.{i}."
    layers = {
        "q_w": stack(p + "attn.qkv.weight", True, split=0),
        "q_b": stack(p + "attn.qkv.bias", split=0),
        "k_w": stack(p + "attn.qkv.weight", True, split=1),
        "k_b": stack(p + "attn.qkv.bias", split=1),
        "v_w": stack(p + "attn.qkv.weight", True, split=2),
        "v_b": stack(p + "attn.qkv.bias", split=2),
        "o_w": stack(p + "attn.proj.weight", True),
        "o_b": stack(p + "attn.proj.bias"),
        "ln1_scale": stack(p + "norm1.weight"),
        "ln1_bias": stack(p + "norm1.bias"),
        "mlp_w1": stack(p + "mlp.fc1.weight", True),
        "mlp_b1": stack(p + "mlp.fc1.bias"),
        "mlp_w2": stack(p + "mlp.fc2.weight", True),
        "mlp_b2": stack(p + "mlp.fc2.bias"),
        "ln2_scale": stack(p + "norm2.weight"),
        "ln2_bias": stack(p + "norm2.bias"),
    }
    return {
        "patch_embedding": jnp.asarray(patch_w, dtype),
        "patch_bias": jnp.asarray(sd["patch_embed.proj.bias"], dtype),
        "cls_token": jnp.asarray(sd["cls_token"].reshape(-1), dtype),
        "position_embedding": jnp.asarray(sd["pos_embed"][0], dtype),
        "layers": layers,
        "final_ln_scale": jnp.asarray(sd["norm.weight"], dtype),
        "final_ln_bias": jnp.asarray(sd["norm.bias"], dtype),
    }
