"""Packed-BERT headline shape: attention_impl xla vs flash.
Packed batch (256 rows, 128 seq), e5-base 12L, bf16, segment masking."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from dataclasses import replace
from marqo_tpu.models.bert import (TextEncoderConfig, init_params,
                                   encode_tokens_packed_jit)

impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
config = TextEncoderConfig(vocab_size=30522, hidden_size=768, num_layers=12,
                           num_heads=12, intermediate_size=3072,
                           attention_impl=impl, pooling="mean",
                           normalize=False)
params = jax.device_put(init_params(config, jax.random.PRNGKey(0),
                                    dtype=jnp.bfloat16), jax.devices()[0])
rows, seq, n_seqs = 256, 128, 512
rng = np.random.default_rng(0)
ids = rng.integers(1, 30522, (rows, seq)).astype(np.int32)
# realistic packed segments: ~2 segments per row
seg = np.zeros((rows, seq), np.int32)
pos = np.zeros((rows, seq), np.int32)
sidx = np.zeros((rows, seq), np.int32)
gid = 0
for r in range(rows):
    c, s = 0, 1
    while c < seq - 16:
        L = int(rng.integers(40, 90))
        L = min(L, seq - c)
        seg[r, c:c+L] = s
        pos[r, c:c+L] = np.arange(L)
        sidx[r, c:c+L] = gid % n_seqs
        c += L; s += 1; gid += 1

ids_d = jnp.asarray(ids); seg_d = jnp.asarray(seg)
pos_d = jnp.asarray(pos); sidx_d = jnp.asarray(sidx)

def call(dep):
    return encode_tokens_packed_jit(params, ids_d + dep, seg_d, pos_d, sidx_d,
                                    n_seqs, config,
                                    compute_dtype=jnp.bfloat16)
out = call(jnp.zeros((), jnp.int32)); float(jnp.asarray(out, jnp.float32).sum())
dep = jnp.zeros((), jnp.int32)
for _ in range(3):
    out = call(dep); dep = (out[0, 0] * 0).astype(jnp.int32)
float(jnp.asarray(out, jnp.float32)[0, 0])
iters = 24
t = time.perf_counter()
dep = jnp.zeros((), jnp.int32)
for _ in range(iters):
    out = call(dep); dep = (out[0, 0] * 0).astype(jnp.int32)
float(jnp.asarray(out, jnp.float32)[0, 0])
dt = (time.perf_counter() - t) / iters * 1e3
print(f"attention_impl={impl}: {dt:.2f} ms/packed-batch", flush=True)
