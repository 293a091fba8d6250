"""Isolated attention micro-bench at ViT-L/14 shapes: flash vs einsum.
Chained deps per the measurement rule; one scalar fetch at the end."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

B, N, S, D = 16, 16, 264, 64
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(B, N, S, D)) * 0.3, jnp.bfloat16)
q, k, v = mk(), mk(), mk()

@jax.jit
def einsum_attn(q, k, v):
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
    scores = scores.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,bntd->bnsd", probs, v)

from marqo_tpu.ops.fused_attention import _mha_nomask

def bench(fn, name, iters=48):
    out = fn(q, k, v); float(jnp.asarray(out, jnp.float32)[0,0,0,0])
    dep = jnp.zeros((), jnp.bfloat16)
    for _ in range(3):
        out = fn(q + dep, k, v); dep = out[0,0,0,0] * 0
    float(jnp.asarray(dep, jnp.float32))
    t = time.perf_counter()
    dep = jnp.zeros((), jnp.bfloat16)
    for _ in range(iters):
        out = fn(q + dep, k, v); dep = out[0,0,0,0] * 0
    float(jnp.asarray(dep, jnp.float32))
    dt = (time.perf_counter() - t) / iters * 1e3
    print(f"{name}: {dt:.3f} ms per call (24 layers -> {dt*24:.1f} ms/batch)", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("both", "einsum"):
    bench(einsum_attn, "einsum")
if which in ("both", "flash"):
    bench(lambda q,k,v: _mha_nomask(q,k,v), "flash")
