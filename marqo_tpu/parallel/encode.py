"""Multi-chip batch-parallel encoding.

The serving-side replacement for the reference's single-device torch encode
loop (s2_inference.py:123-158): one jit over a (dp, tp) mesh; XLA splits the
batch across dp, shards the matmuls across tp, and rides ICI for the
collectives. Callers pad batches to a multiple of dp (bucketing already
guarantees power-of-two batch sizes).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marqo_tpu.models.bert import TextEncoderConfig, encode_tokens
from marqo_tpu.parallel.mesh import AXIS_DP


def make_sharded_encode(mesh: Mesh, config: TextEncoderConfig,
                        compute_dtype=jnp.bfloat16):
    """Returns encode(params, ids, mask) jitted over ``mesh``.

    Params must already be placed with ``shard_params(params, mesh)``; inputs
    are placed batch-sharded here.
    """
    data_sharding = NamedSharding(mesh, P(AXIS_DP))
    out_sharding = NamedSharding(mesh, P(AXIS_DP))

    @partial(jax.jit, out_shardings=out_sharding)
    def _encode(params, input_ids, attention_mask):
        return encode_tokens(params, input_ids, attention_mask, config,
                             compute_dtype=compute_dtype)

    def encode(params, input_ids, attention_mask):
        input_ids = jax.device_put(input_ids, data_sharding)
        attention_mask = jax.device_put(attention_mask, data_sharding)
        return _encode(params, input_ids, attention_mask)

    return encode
