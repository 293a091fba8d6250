"""ViT-L/14 throughput: XLA einsum attention vs fused flash kernel."""
import os, sys, time
import jax, jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "on"
if mode == "off":
    os.environ["MARQO_TPU_FUSED_ATTENTION"] = "FALSE"

from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   encode_clip_image_jit, init_clip_params)
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
out = encode_clip_image_jit(params, pixels, vision)
float(out.sum())
dep = jnp.zeros((), jnp.uint8)
for _ in range(3):
    out = encode_clip_image_jit(params, pixels + dep, vision)
    dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
float(out.sum())
iters = 12
start = time.perf_counter()
dep = jnp.zeros((), jnp.uint8)
for _ in range(iters):
    out = encode_clip_image_jit(params, pixels + dep, vision)
    dep = jnp.isnan(out[0, 0]).astype(jnp.uint8)
float(out.sum())
rate = batch * iters / (time.perf_counter() - start)
print(f"flash={mode}: {rate:.1f} imgs/s", flush=True)
