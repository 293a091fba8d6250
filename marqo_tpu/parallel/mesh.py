"""Device mesh + sharding layout for multi-chip serving and fine-tuning.

The reference has no collective layer (SURVEY.md §2.3 — HTTP-only
boundaries); the TPU build scales the embedding math over ICI with a 2-axis
``jax.sharding.Mesh``:

  - ``dp`` (data parallel): batches of documents/queries split across chips —
    the serving workload's natural axis (reference request-level parallelism,
    add_docs.py thread pools → here, XLA-partitioned batches).
  - ``tp`` (tensor parallel): attention heads + FFN hidden sharded for
    encoders too large for one chip's HBM (reference has none, D3).

We annotate shardings with NamedSharding/PartitionSpec and let XLA insert
all-gather/reduce-scatter over ICI (the scaling-book recipe).
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marqo_tpu.api import configs

AXIS_DP = "dp"
AXIS_TP = "tp"


def create_mesh(devices: Optional[Sequence] = None,
                shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Build a (dp, tp) mesh. ``shape`` defaults to MARQO_TPU_MESH_SHAPE or
    all-data-parallel (n, 1)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        env = configs.read_env_vars_and_defaults("MARQO_TPU_MESH_SHAPE")
        if env:
            dp, tp = (int(x) for x in str(env).split(","))
            shape = (dp, tp)
        else:
            shape = (n, 1)
    dp, tp = shape
    if dp * tp != n:
        raise ValueError(f"Mesh shape {shape} does not match {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_TP))


def batch_spec() -> P:
    """Activations: batch over dp, everything else replicated per tp rules."""
    return P(AXIS_DP)


def encoder_param_specs(params: dict) -> dict:
    """PartitionSpecs for the BERT-family param pytree (models/bert.py).

    Megatron-style TP: QKV/FFN-in shard the output feature dim, O/FFN-out
    shard the input feature dim, so each block needs only one psum (XLA
    inserts it). Embeddings + LayerNorms replicate.
    """
    emb = {key: P() for key in params["embeddings"]}
    layer_specs = {
        "q_w": P(None, None, AXIS_TP), "q_b": P(None, AXIS_TP),
        "k_w": P(None, None, AXIS_TP), "k_b": P(None, AXIS_TP),
        "v_w": P(None, None, AXIS_TP), "v_b": P(None, AXIS_TP),
        "o_w": P(None, AXIS_TP, None), "o_b": P(None),
        "attn_ln_scale": P(None), "attn_ln_bias": P(None),
        "ffn_w1": P(None, None, AXIS_TP), "ffn_b1": P(None, AXIS_TP),
        "ffn_w2": P(None, AXIS_TP, None), "ffn_b2": P(None),
        "ffn_ln_scale": P(None), "ffn_ln_bias": P(None),
    }
    return {"embeddings": emb,
            "layers": {k: layer_specs[k] for k in params["layers"]}}


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = encoder_param_specs(params)
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
