"""Contrastive fine-tuning step for embedding models, sharded over a mesh.

The reference is inference-only (SURVEY.md §2.3: no training stack). This
framework adds TPU-native fine-tuning of its embedding encoders — in-batch
InfoNCE (the e5/CLIP training objective) over a (dp, tp) mesh:

  - batch axis sharded over ``dp``; the logits matrix q·pᵀ needs the full
    gallery, so XLA all-gathers the (small) pooled embeddings over ICI —
    bandwidth-cheap (B×H), never the (B×S×H) activations.
  - encoder matmuls sharded over ``tp`` (mesh.encoder_param_specs).
  - optimizer: optax adamw; opt state inherits param shardings.
"""

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marqo_tpu.models.bert import TextEncoderConfig, encode_tokens
from marqo_tpu.parallel.mesh import AXIS_DP, shard_params


def info_nce_loss(query_emb: jax.Array, passage_emb: jax.Array,
                  temperature: float = 0.05) -> jax.Array:
    """Symmetric in-batch InfoNCE. Inputs are L2-normalized (B, H) fp32."""
    logits = (query_emb @ passage_emb.T) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_q + loss_p) * 0.5


def make_train_state(params: dict, mesh: Mesh,
                     learning_rate: float = 1e-5):
    """Shard params over the mesh and build matching optimizer state."""
    params = shard_params(params, mesh)
    optimizer = optax.adamw(learning_rate)
    opt_state = jax.jit(
        optimizer.init,
        out_shardings=None,  # let XLA propagate from param shardings
    )(params)
    return params, optimizer, opt_state


def make_train_step(config: TextEncoderConfig, mesh: Mesh,
                    optimizer: optax.GradientTransformation,
                    compute_dtype=jnp.bfloat16,
                    temperature: float = 0.05):
    """Returns step(params, opt_state, batch) -> (params, opt_state, loss).

    ``batch`` = dict(query_ids, query_mask, passage_ids, passage_mask),
    each (B, S) with B divisible by the dp axis size.
    """
    data_sharding = NamedSharding(mesh, P(AXIS_DP))

    def loss_fn(params, batch):
        q = encode_tokens(params, batch["query_ids"], batch["query_mask"],
                          config, compute_dtype=compute_dtype)
        p = encode_tokens(params, batch["passage_ids"], batch["passage_mask"],
                          config, compute_dtype=compute_dtype)
        return info_nce_loss(q, p, temperature)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, batch):
        batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
        return step(params, opt_state, batch)

    return run
