"""Alternating e2e ViT-L flash on/off, 3 rounds each, to beat chip drift."""
import os, time, sys
import jax, jax.numpy as jnp
import numpy as np

from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   init_clip_params)
from marqo_tpu.models import clip as clip_mod
from marqo_tpu.ops import fused_attention as fa

vision = CLIPVisionConfig(image_size=224, patch_size=14, hidden_size=1024,
                          num_layers=24, num_heads=16,
                          intermediate_size=4096, projection_dim=768)
text = CLIPTextConfig(hidden_size=768, num_layers=12, num_heads=12,
                      intermediate_size=3072, projection_dim=768)
params = jax.device_put(
    init_clip_params(text, vision, jax.random.PRNGKey(0),
                     dtype=jnp.bfloat16), jax.devices()[0])
batch = 16
pixels = jnp.zeros((batch, 224, 224, 3), dtype=jnp.uint8)

from functools import partial

def make_fn(flash):
    os.environ["MARQO_TPU_FUSED_ATTENTION"] = "TRUE" if flash else "FALSE"
    # re-jit fresh so the trace picks up the env gate
    f = jax.jit(partial(clip_mod.encode_clip_image,
                        config=vision, compute_dtype=jnp.bfloat16))
    out = f(params, pixels); float(out.sum())
    return f

fns = {"on": make_fn(True), "off": make_fn(False)}

def run(f, iters=12):
    dep = jnp.zeros((), jnp.uint8)
    for _ in range(3):
        out = f(params, pixels + dep)
        dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
    float(out.sum())
    t = time.perf_counter()
    dep = jnp.zeros((), jnp.uint8)
    for _ in range(iters):
        out = f(params, pixels + dep)
        dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
    float(out.sum())
    return batch * iters / (time.perf_counter() - t)

for rnd in range(3):
    for name in ("on", "off"):
        print(f"round{rnd} flash={name}: {run(fns[name]):.1f} imgs/s", flush=True)
