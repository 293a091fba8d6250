"""Headline benchmark: add_documents embedding throughput (docs/sec/chip).

Model: e5-base-v2 architecture (BERT-base 12L/768H), bf16, batch 256 ×
seq 128 — the reference quick-start model (BASELINE.md config 1); one doc =
one 128-token chunk (reference default sequence length, s2_inference
configs). Baseline target: 10,000 docs/sec/chip on TPU v5e (BASELINE.json);
vs_baseline = value / 10000.

Execution notes: the axon TPU platform defers execution until a host fetch,
so each timed iteration's input carries a data dependency on the previous
output (preventing dead-code elimination / reordering) and the loop is
forced with a single scalar fetch at the end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                       init_params)

    config = TextEncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072)
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.device_put(params, jax.devices()[0])

    batch, seq = 256, 128
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30522, (batch, seq)).astype(np.int32))
    mask = jnp.ones((batch, seq), dtype=jnp.int32)

    fn = jax.jit(lambda p, i, m: encode_tokens(
        p, i, m, config, compute_dtype=jnp.bfloat16))

    # warmup: compile + one forced execution
    out = fn(params, ids, mask)
    float(out.sum())

    def run(n_iters: int) -> float:
        start = time.perf_counter()
        cur_ids = ids
        out = None
        for _ in range(n_iters):
            out = fn(params, cur_ids, mask)
            # 0/1 value derived from the output chains the next iteration on
            # this one; never constant-foldable, adds one VPU op of work
            dep = jnp.isnan(out[0, 0]).astype(jnp.int32)
            cur_ids = ids + dep[None, None]
        float(out.sum())  # force the whole chain
        return time.perf_counter() - start

    run(3)  # second warmup incl. the dependency graph shape
    n_iters = 30
    elapsed = run(n_iters)

    docs_per_sec = (n_iters * batch) / elapsed
    print(json.dumps({
        "metric": "add_documents_embed_throughput",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec/chip",
        "vs_baseline": round(docs_per_sec / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
