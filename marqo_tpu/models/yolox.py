"""YOLOX-S object detector in functional JAX — the marqo-yolo patcher.

Parity: the reference's `marqo-yolo` / `yolox` patch methods run the
Marqo/marqo-yolo-v2 yolox_s.onnx export through onnxruntime
(processing/yolox_utils.py:36-166, PatchifyYolox image.py:411-445). This
is the same architecture TPU-native: CSPDarknet-S backbone (Focus stem,
CSP layers, SPP), PAFPN neck, decoupled heads over strides 8/16/32 —
NHWC convs that XLA maps onto the MXU.

Output format matches the ONNX export consumed by the reference's
demo_postprocess (yolox_utils.py:90-121): (B, N, 5 + num_classes) with
RAW xy/wh per anchor cell and SIGMOIDED objectness/class scores; the
numpy grid decode in inference/image_patching.py mirrors the reference.

Weights: the reference ships ONNX only; conversion needs the original
Megvii .pth (gated offline). Random-init exercises the full graph for
tests; the patching pipeline is weight-agnostic.
"""

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class YoloxConfig:
    num_classes: int = 80
    width: float = 0.50   # yolox-s
    depth: float = 0.33
    input_size: int = 384  # reference PatchifyYolox input_shape (384, 384)

    def ch(self, base: int) -> int:
        return int(base * self.width)

    def n(self, base: int) -> int:
        return max(1, round(base * self.depth))


def _conv_params(rng, cin: int, cout: int, k: int, dtype) -> dict:
    std = (2.0 / (k * k * cin)) ** 0.5
    return {
        "w": (jax.random.normal(rng, (k, k, cin, cout)) * std).astype(dtype),
        "bn_scale": jnp.ones((cout,), dtype),
        "bn_bias": jnp.zeros((cout,), dtype),
        "bn_mean": jnp.zeros((cout,), dtype),
        "bn_var": jnp.ones((cout,), dtype),
    }


def _conv(x, p, stride: int = 1, act: bool = True):
    """Conv + BatchNorm(inference) + SiLU (YOLOX BaseConv)."""
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    x = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = (p["bn_scale"] / jnp.sqrt(p["bn_var"] + 1e-3)).astype(x.dtype)
    bias = (p["bn_bias"] - p["bn_mean"] * p["bn_scale"] /
            jnp.sqrt(p["bn_var"] + 1e-3)).astype(x.dtype)
    x = x * scale + bias
    return jax.nn.silu(x) if act else x


def _bottleneck(x, p, shortcut: bool):
    y = _conv(x, p["conv1"])
    y = _conv(y, p["conv2"])
    return x + y if shortcut else y


def _csp(x, p, shortcut: bool):
    """CSPLayer: split, n bottlenecks on one branch, concat, fuse."""
    a = _conv(x, p["conv1"])
    b = _conv(x, p["conv2"])
    for bp in p["blocks"]:
        a = _bottleneck(a, bp, shortcut)
    return _conv(jnp.concatenate([a, b], axis=-1), p["conv3"])


def _spp(x, p):
    """SPPBottleneck with 5/9/13 max pools."""
    x = _conv(x, p["conv1"])
    pools = [x]
    for k in (5, 9, 13):
        pools.append(jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]))
    return _conv(jnp.concatenate(pools, axis=-1), p["conv2"])


def _focus(x, p):
    """Focus stem: 2x2 space-to-depth then conv."""
    tl = x[:, ::2, ::2, :]
    bl = x[:, 1::2, ::2, :]
    tr = x[:, ::2, 1::2, :]
    br = x[:, 1::2, 1::2, :]
    return _conv(jnp.concatenate([tl, bl, tr, br], axis=-1), p["conv"])


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


# --- init --------------------------------------------------------------------

def _init_csp(rng, cin, cout, n, dtype, expansion=0.5):
    hidden = int(cout * expansion)
    keys = jax.random.split(rng, 3 + 2 * n)
    return {
        "conv1": _conv_params(keys[0], cin, hidden, 1, dtype),
        "conv2": _conv_params(keys[1], cin, hidden, 1, dtype),
        "conv3": _conv_params(keys[2], 2 * hidden, cout, 1, dtype),
        "blocks": [{"conv1": _conv_params(keys[3 + 2 * i], hidden, hidden,
                                          1, dtype),
                    "conv2": _conv_params(keys[4 + 2 * i], hidden, hidden,
                                          3, dtype)}
                   for i in range(n)],
    }


def init_params(config: YoloxConfig, rng, dtype=jnp.float32) -> dict:
    c = config.ch
    keys = iter(jax.random.split(rng, 64))

    def nk():
        return next(keys)

    backbone = {
        "stem": {"conv": _conv_params(nk(), 12, c(64), 3, dtype)},
        "dark2_conv": _conv_params(nk(), c(64), c(128), 3, dtype),
        "dark2_csp": _init_csp(nk(), c(128), c(128), config.n(3), dtype),
        "dark3_conv": _conv_params(nk(), c(128), c(256), 3, dtype),
        "dark3_csp": _init_csp(nk(), c(256), c(256), config.n(9), dtype),
        "dark4_conv": _conv_params(nk(), c(256), c(512), 3, dtype),
        "dark4_csp": _init_csp(nk(), c(512), c(512), config.n(9), dtype),
        "dark5_conv": _conv_params(nk(), c(512), c(1024), 3, dtype),
        "dark5_spp": {"conv1": _conv_params(nk(), c(1024), c(1024) // 2, 1,
                                            dtype),
                      "conv2": _conv_params(nk(), c(1024) * 2, c(1024), 1,
                                            dtype)},
        "dark5_csp": _init_csp(nk(), c(1024), c(1024), config.n(3), dtype),
    }
    neck = {
        "lateral0": _conv_params(nk(), c(1024), c(512), 1, dtype),
        "c3_p4": _init_csp(nk(), c(1024), c(512), config.n(3), dtype),
        "reduce1": _conv_params(nk(), c(512), c(256), 1, dtype),
        "c3_p3": _init_csp(nk(), c(512), c(256), config.n(3), dtype),
        "bu2": _conv_params(nk(), c(256), c(256), 3, dtype),
        "c3_n3": _init_csp(nk(), c(512), c(512), config.n(3), dtype),
        "bu1": _conv_params(nk(), c(512), c(512), 3, dtype),
        "c3_n4": _init_csp(nk(), c(1024), c(1024), config.n(3), dtype),
    }
    head_w = c(256)
    heads = []
    for cin in (c(256), c(512), c(1024)):
        heads.append({
            "stem": _conv_params(nk(), cin, head_w, 1, dtype),
            "cls1": _conv_params(nk(), head_w, head_w, 3, dtype),
            "cls2": _conv_params(nk(), head_w, head_w, 3, dtype),
            "reg1": _conv_params(nk(), head_w, head_w, 3, dtype),
            "reg2": _conv_params(nk(), head_w, head_w, 3, dtype),
            "cls_pred": _conv_params(nk(), head_w, config.num_classes, 1,
                                     dtype),
            "reg_pred": _conv_params(nk(), head_w, 4, 1, dtype),
            "obj_pred": _conv_params(nk(), head_w, 1, 1, dtype),
        })
    return {"backbone": backbone, "neck": neck, "heads": heads}


# --- forward -----------------------------------------------------------------

def forward(params: dict, pixels: jax.Array,
            config: YoloxConfig) -> jax.Array:
    """(B, S, S, 3) float32 (YOLOX convention: raw 0-255 BGR, already
    letterboxed) → (B, N, 5 + num_classes): raw xy/wh per anchor with
    sigmoided objectness + class scores (matches the reference's ONNX
    export feeding demo_postprocess)."""
    bb, neck, heads = params["backbone"], params["neck"], params["heads"]

    x = _focus(pixels, bb["stem"])
    x = _conv(x, bb["dark2_conv"], stride=2)
    x = _csp(x, bb["dark2_csp"], shortcut=True)
    x = _conv(x, bb["dark3_conv"], stride=2)
    d3 = _csp(x, bb["dark3_csp"], shortcut=True)
    x = _conv(d3, bb["dark4_conv"], stride=2)
    d4 = _csp(x, bb["dark4_csp"], shortcut=True)
    x = _conv(d4, bb["dark5_conv"], stride=2)
    x = _spp(x, bb["dark5_spp"])
    d5 = _csp(x, bb["dark5_csp"], shortcut=False)

    # PAFPN
    lat0 = _conv(d5, neck["lateral0"])
    p4 = _csp(jnp.concatenate([_upsample2(lat0), d4], axis=-1),
              neck["c3_p4"], shortcut=False)
    red1 = _conv(p4, neck["reduce1"])
    out8 = _csp(jnp.concatenate([_upsample2(red1), d3], axis=-1),
                neck["c3_p3"], shortcut=False)
    bu2 = _conv(out8, neck["bu2"], stride=2)
    out16 = _csp(jnp.concatenate([bu2, red1], axis=-1), neck["c3_n3"],
                 shortcut=False)
    bu1 = _conv(out16, neck["bu1"], stride=2)
    out32 = _csp(jnp.concatenate([bu1, lat0], axis=-1), neck["c3_n4"],
                 shortcut=False)

    outputs = []
    for feat, hp in zip((out8, out16, out32), heads):
        stem = _conv(feat, hp["stem"])
        cls_feat = _conv(_conv(stem, hp["cls1"]), hp["cls2"])
        reg_feat = _conv(_conv(stem, hp["reg1"]), hp["reg2"])
        cls_out = jax.nn.sigmoid(_conv(cls_feat, hp["cls_pred"], act=False))
        reg_out = _conv(reg_feat, hp["reg_pred"], act=False)
        obj_out = jax.nn.sigmoid(_conv(reg_feat, hp["obj_pred"], act=False))
        level = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
        B = level.shape[0]
        outputs.append(level.reshape(B, -1, level.shape[-1]))
    return jnp.concatenate(outputs, axis=1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("config",))
def forward_jit(params, pixels, config):
    return forward(params, pixels, config)


def decode_outputs(outputs: np.ndarray, img_size: Tuple[int, int]
                   ) -> np.ndarray:
    """Grid decode — numerically identical to the reference's
    demo_postprocess (yolox_utils.py:90-121): xy = (raw + grid) * stride,
    wh = exp(raw) * stride, strides 8/16/32."""
    grids: List[np.ndarray] = []
    expanded: List[np.ndarray] = []
    for stride in (8, 16, 32):
        hsize, wsize = img_size[0] // stride, img_size[1] // stride
        xv, yv = np.meshgrid(np.arange(wsize), np.arange(hsize))
        grid = np.stack((xv, yv), 2).reshape(1, -1, 2)
        grids.append(grid)
        expanded.append(np.full((*grid.shape[:2], 1), stride))
    grid = np.concatenate(grids, 1)
    strides = np.concatenate(expanded, 1)
    outputs = outputs.copy()
    outputs[..., :2] = (outputs[..., :2] + grid) * strides
    # clip keeps exp finite in float32 (only reachable with synthetic
    # weights; real logits are far below 80)
    outputs[..., 2:4] = np.exp(np.minimum(outputs[..., 2:4], 80.0)) * strides
    return outputs
