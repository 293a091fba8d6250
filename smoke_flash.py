"""Tiny-shape TPU smoke test for ops/fused_attention.py (protocol gate 2)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
t0 = time.time()
print("backend:", jax.default_backend(), flush=True)
from marqo_tpu.ops.fused_attention import fused_attention

B, N, S, D = 2, 2, 128, 64
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(B, N, S, D)) * 0.3, jnp.bfloat16)
q, k, v = mk(), mk(), mk()
out = fused_attention(q, k, v)
val = float(jnp.asarray(out, jnp.float32).sum())
print(f"nomask smoke ok sum={val:.4f} t={time.time()-t0:.1f}s", flush=True)

seg = np.zeros((B, S), np.int32)
for b in range(B):
    pos, sid = 0, 1
    while pos < S - 8:
        L = int(rng.integers(8, 40)); seg[b, pos:pos+L] = sid; pos += L; sid += 1
out2 = fused_attention(q, k, v, segment_ids=jnp.asarray(seg))
val2 = float(jnp.asarray(out2, jnp.float32).sum())
print(f"segment smoke ok sum={val2:.4f} t={time.time()-t0:.1f}s", flush=True)

# odd-seq ViT-like shape
S3 = 264
mk3 = lambda: jnp.asarray(rng.normal(size=(2, 2, S3, D)) * 0.3, jnp.bfloat16)
q3, k3, v3 = mk3(), mk3(), mk3()
out3 = fused_attention(q3, k3, v3)
val3 = float(jnp.asarray(out3, jnp.float32).sum())
print(f"odd-seq-264 smoke ok sum={val3:.4f} t={time.time()-t0:.1f}s", flush=True)
