"""Block-size sweep for the flash kernel at ViT-L shapes (relative timings)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes
from functools import partial

B, N, S, D = 16, 16, 264, 64
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(B, N, S, D)) * 0.3, jnp.bfloat16)
q, k, v = mk(), mk(), mk()
sm = float(1/np.sqrt(D))

@jax.jit
def einsum_attn(q, k, v):
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * sm
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,bntd->bnsd", probs, v)

def make_flash(bb, bq, bk):
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb)
    @jax.jit
    def f(q, k, v):
        return flash_attention(q, k, v, sm_scale=sm, block_sizes=bs)
    return f

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
    print(f"{name}: {dt:.3f} ms/call", flush=True)

bench(einsum_attn, "einsum")
for bb in (4, 8, 16):
    bench(make_flash(bb, 264, 264), f"flash bb={bb} full-seq")

bench(einsum_attn, "einsum(re)")
