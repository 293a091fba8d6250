"""Faster R-CNN region proposer (ResNet-50 FPN + RPN) in functional JAX —
the `frcnn` patch method's detector.

Parity: the reference's frcnn patcher runs torchvision's
fasterrcnn_resnet50_fpn and keeps its boxes+scores for class-agnostic
patching (reference processing/pytorch_utils.py load_pytorch,
PatchifyPytorch image.py:379-409). Patching needs class-agnostic regions,
which Faster R-CNN derives from this exact stack: ResNet-50 backbone →
FPN P2–P6 → RPN objectness + box deltas over anchors. We implement that
proposal stage TPU-native (NHWC convs on the MXU) and rank by RPN
objectness; the reference's ROI classification head refines
class scores, which class-agnostic patching discards anyway.

Weights: torchvision is not installed and checkpoints cannot be fetched
offline; the converter accepts a torchvision fasterrcnn_resnet50_fpn
state dict from disk (MARQO_FRCNN_WEIGHTS_PATH), and
MARQO_PATCH_MODELS_RANDOM_INIT=TRUE runs the full graph with synthetic
weights (tests / smoke).
"""

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FrcnnConfig:
    input_size: int = 384          # reference PatchifyPytorch input_shape
    fpn_channels: int = 256
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # torchvision anchor sizes per FPN level P2..P6
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    width: float = 1.0             # resnet-50 channel multiplier

    def ch(self, base: int) -> int:
        return max(8, int(base * self.width))


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_params(rng, cin, cout, k, dtype):
    std = (2.0 / (k * k * cin)) ** 0.5
    return {
        "w": (jax.random.normal(rng, (k, k, cin, cout)) * std).astype(dtype),
        "scale": jnp.ones((cout,), dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _conv(x, p, stride=1, relu=True):
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    x = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(x) if relu else x


def _bottleneck(x, p, stride=1):
    """ResNet bottleneck 1x1 → 3x3 → 1x1 with projection shortcut."""
    out = _conv(x, p["conv1"])
    out = _conv(out, p["conv2"], stride=stride)
    out = _conv(out, p["conv3"], relu=False)
    shortcut = x
    if "down" in p:
        shortcut = _conv(x, p["down"], stride=stride, relu=False)
    return jax.nn.relu(out + shortcut)


def _init_bottleneck(rng, cin, mid, cout, dtype, down):
    keys = jax.random.split(rng, 4)
    p = {
        "conv1": _conv_params(keys[0], cin, mid, 1, dtype),
        "conv2": _conv_params(keys[1], mid, mid, 3, dtype),
        "conv3": _conv_params(keys[2], mid, cout, 1, dtype),
    }
    if down:
        p["down"] = _conv_params(keys[3], cin, cout, 1, dtype)
    return p


def init_params(config: FrcnnConfig, rng, dtype=jnp.float32) -> dict:
    c = config.ch
    keys = iter(jax.random.split(rng, 64))

    def nk():
        return next(keys)

    # resnet-50 stages: (blocks, mid, out)
    stages = [(3, c(64), c(256)), (4, c(128), c(512)),
              (6, c(256), c(1024)), (3, c(512), c(2048))]
    backbone = {"stem": _conv_params(nk(), 3, c(64), 7, dtype)}
    cin = c(64)
    for s, (n, mid, cout) in enumerate(stages):
        blocks = []
        for b in range(n):
            stride = 2 if (b == 0 and s > 0) else 1
            blocks.append(_init_bottleneck(nk(), cin if b == 0 else cout,
                                           mid, cout, dtype,
                                           down=(b == 0)))
        backbone[f"stage{s + 2}"] = blocks
        cin = cout
    F = config.fpn_channels
    fpn = {}
    for level, cc in zip((2, 3, 4, 5), (c(256), c(512), c(1024), c(2048))):
        fpn[f"lateral{level}"] = _conv_params(nk(), cc, F, 1, dtype)
        fpn[f"output{level}"] = _conv_params(nk(), F, F, 3, dtype)
    A = len(config.anchor_ratios)
    rpn = {
        "conv": _conv_params(nk(), F, F, 3, dtype),
        "objectness": _conv_params(nk(), F, A, 1, dtype),
        "deltas": _conv_params(nk(), F, 4 * A, 1, dtype),
    }
    return {"backbone": backbone, "fpn": fpn, "rpn": rpn}


def forward(params: dict, pixels: jax.Array, config: FrcnnConfig
            ) -> List[Tuple[jax.Array, jax.Array]]:
    """(B, S, S, 3) float32 normalized → per FPN level (objectness logits
    (B, H, W, A), box deltas (B, H, W, 4A))."""
    bb = params["backbone"]
    x = _conv(pixels, bb["stem"], stride=2)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = {}
    for s in (2, 3, 4, 5):
        for i, block in enumerate(bb[f"stage{s}"]):
            x = _bottleneck(x, block, stride=2 if (i == 0 and s > 2) else 1)
        feats[s] = x
    fpn = params["fpn"]
    p5 = _conv(feats[5], fpn["lateral5"], relu=False)
    p4 = _conv(feats[4], fpn["lateral4"], relu=False) + \
        jax.image.resize(p5, (p5.shape[0], p5.shape[1] * 2, p5.shape[2] * 2,
                              p5.shape[3]), "nearest")
    p3 = _conv(feats[3], fpn["lateral3"], relu=False) + \
        jax.image.resize(p4, (p4.shape[0], p4.shape[1] * 2, p4.shape[2] * 2,
                              p4.shape[3]), "nearest")
    p2 = _conv(feats[2], fpn["lateral2"], relu=False) + \
        jax.image.resize(p3, (p3.shape[0], p3.shape[1] * 2, p3.shape[2] * 2,
                              p3.shape[3]), "nearest")
    levels = [
        _conv(p2, fpn["output2"], relu=False),
        _conv(p3, fpn["output3"], relu=False),
        _conv(p4, fpn["output4"], relu=False),
        _conv(p5, fpn["output5"], relu=False),
    ]
    # P6: stride-2 max pool of P5 (torchvision LastLevelMaxPool)
    levels.append(jax.lax.reduce_window(
        levels[-1], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)]))
    rpn = params["rpn"]
    outputs = []
    for feat in levels:
        h = _conv(feat, rpn["conv"])
        outputs.append((_conv(h, rpn["objectness"], relu=False),
                        _conv(h, rpn["deltas"], relu=False)))
    return outputs


@partial(jax.jit, static_argnames=("config",))
def forward_jit(params, pixels, config):
    return forward(params, pixels, config)


def decode_proposals(outputs, config: FrcnnConfig
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Anchors + deltas → (N, 4) xyxy proposals and (N,) objectness scores
    for image 0 (torchvision RPN decode: dx,dy scale the anchor center,
    dw,dh exponentiate its size)."""
    boxes, scores = [], []
    for (obj, deltas), size in zip(outputs, config.anchor_sizes):
        obj = np.asarray(obj)[0]
        deltas = np.asarray(deltas)[0]
        H, W, A = obj.shape
        stride = config.input_size / H
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        cx = (xs + 0.5) * stride
        cy = (ys + 0.5) * stride
        for a, ratio in enumerate(config.anchor_ratios):
            aw = size * np.sqrt(1.0 / ratio)
            ah = size * np.sqrt(ratio)
            d = deltas[:, :, 4 * a:4 * a + 4]
            pcx = cx + d[:, :, 0] * aw
            pcy = cy + d[:, :, 1] * ah
            pw = aw * np.exp(np.minimum(d[:, :, 2], 4.0))
            ph = ah * np.exp(np.minimum(d[:, :, 3], 4.0))
            level_boxes = np.stack([pcx - pw / 2, pcy - ph / 2,
                                    pcx + pw / 2, pcy + ph / 2], axis=-1)
            boxes.append(level_boxes.reshape(-1, 4))
            # clamp logits before sigmoid: raw RPN objectness can be very
            # negative and np.exp(-x) would overflow (harmless but noisy)
            logit = np.clip(obj[:, :, a].reshape(-1), -30.0, 30.0)
            scores.append(1.0 / (1.0 + np.exp(-logit)))
    return np.concatenate(boxes, axis=0), np.concatenate(scores, axis=0)
