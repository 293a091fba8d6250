"""Multi-chip paths on the virtual 8-device CPU mesh: sharded encode parity,
contrastive train step convergence, param sharding layouts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from marqo_tpu.models.bert import TextEncoderConfig, encode_tokens, init_params
from marqo_tpu.parallel.encode import make_sharded_encode
from marqo_tpu.parallel.mesh import (AXIS_DP, AXIS_TP, create_mesh,
                                     encoder_param_specs, shard_params)
from marqo_tpu.parallel.train_step import (info_nce_loss, make_train_state,
                                           make_train_step)

CONFIG = TextEncoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                           num_heads=4, intermediate_size=128,
                           max_position_embeddings=64)


@pytest.fixture(scope="module")
def params():
    return init_params(CONFIG, jax.random.PRNGKey(0))


def _batch(n=16, seq=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 256, (n, seq)).astype(np.int32)
    mask = np.ones((n, seq), np.int32)
    return jnp.asarray(ids), jnp.asarray(mask)


class TestMesh:
    def test_create_mesh_shapes(self):
        mesh = create_mesh(jax.devices()[:8], shape=(4, 2))
        assert mesh.shape == {AXIS_DP: 4, AXIS_TP: 2}
        with pytest.raises(ValueError):
            create_mesh(jax.devices()[:8], shape=(3, 2))

    def test_param_specs_cover_all_leaves(self, params):
        specs = encoder_param_specs(params)
        assert set(specs["layers"]) == set(params["layers"])
        assert set(specs["embeddings"]) == set(params["embeddings"])


class TestShardedEncode:
    def test_matches_single_device(self, params):
        mesh = create_mesh(jax.devices()[:8], shape=(4, 2))
        ids, mask = _batch()
        ref = np.asarray(encode_tokens(params, ids, mask, CONFIG,
                                       compute_dtype=jnp.float32))
        sharded_params = shard_params(params, mesh)
        encode = make_sharded_encode(mesh, CONFIG,
                                     compute_dtype=jnp.float32)
        out = np.asarray(encode(sharded_params, ids, mask))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_all_dp_mesh(self, params):
        mesh = create_mesh(jax.devices()[:8], shape=(8, 1))
        ids, mask = _batch(seed=1)
        ref = np.asarray(encode_tokens(params, ids, mask, CONFIG,
                                       compute_dtype=jnp.float32))
        out = np.asarray(make_sharded_encode(mesh, CONFIG,
                                             compute_dtype=jnp.float32)(
            shard_params(params, mesh), ids, mask))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestTrainStep:
    def test_loss_decreases(self, params):
        import optax
        mesh = create_mesh(jax.devices()[:8], shape=(4, 2))
        p, optimizer, opt_state = make_train_state(params, mesh,
                                                   learning_rate=5e-3)
        step = make_train_step(CONFIG, mesh, optimizer,
                               compute_dtype=jnp.float32)
        rng = np.random.default_rng(0)
        batch = {
            "query_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
            "query_mask": np.ones((8, 12), np.int32),
            "passage_ids": rng.integers(1, 256, (8, 12)).astype(np.int32),
            "passage_mask": np.ones((8, 12), np.int32),
        }
        losses = []
        for _ in range(5):
            p, opt_state, loss = step(p, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_info_nce_identity_batch(self):
        emb = jnp.eye(4, 8)
        loss = float(info_nce_loss(emb, emb, temperature=0.05))
        # perfectly aligned pairs → near-zero loss
        assert loss < 0.01

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
