"""Sequence packing: packed forward must equal the per-sequence unpacked
forward (no cross-segment contamination), and the packer must be dense."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                   encode_tokens_packed, init_params)
from marqo_tpu.ops.packing import pack_sequences, packing_efficiency


@pytest.fixture(scope="module")
def small_model():
    config = TextEncoderConfig(vocab_size=200, hidden_size=32, num_layers=2,
                               num_heads=2, intermediate_size=64,
                               max_position_embeddings=64)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def _ragged_sequences(n, max_len, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(1, 200, size=rng.integers(3, max_len)).tolist()
            for _ in range(n)]


class TestPacker:
    def test_all_tokens_placed(self):
        seqs = _ragged_sequences(20, 30)
        batch = pack_sequences(seqs, seq_len=32)
        assert batch.n_sequences == 20
        total_tokens = sum(min(len(s), 32) for s in seqs)
        assert int((batch.segment_ids > 0).sum()) == total_tokens
        # every sequence index appears with its full length
        for i, s in enumerate(seqs):
            assert int((batch.seq_index == i).sum()) == min(len(s), 32)

    def test_efficiency_beats_padding(self):
        seqs = _ragged_sequences(64, 30, seed=1)
        batch = pack_sequences(seqs, seq_len=32)
        padded_rows = 64  # unpacked: one row each
        assert batch.input_ids.shape[0] < padded_rows
        assert packing_efficiency(batch) > 0.5

    def test_truncation(self):
        batch = pack_sequences([[5] * 100], seq_len=16)
        assert int((batch.segment_ids > 0).sum()) == 16

    def test_row_bucket_ladder(self):
        """Nearby row counts land on the SAME padded row count so steady-
        state serving reuses one compiled shape instead of recompiling per
        token-mass fluctuation (the e2e ingest bench was paying an XLA
        compile in most timed batches before this)."""
        ladder = [16, 32, 48, 64, 96, 128]
        shapes = set()
        for seed in range(4):
            # ~40±4 rows of token mass
            seqs = _ragged_sequences(80, 30, seed=seed)
            batch = pack_sequences(seqs, seq_len=32, row_buckets=ladder)
            shapes.add(batch.input_ids.shape[0])
            assert batch.input_ids.shape[0] in ladder
        assert len(shapes) == 1
        # beyond the top of the ladder: multiples of the top, never truncated
        seqs = [[1] * 32 for _ in range(300)]
        batch = pack_sequences(seqs, seq_len=32, row_buckets=ladder)
        assert batch.input_ids.shape[0] == 384  # 3 * 128
        assert batch.n_sequences == 300

    def test_row_bucket_ladder_default_wired(self):
        """The ingest path (loaders._dispatch_packed) uses the config ladder."""
        from marqo_tpu.inference.batching import pick_row_bucket, row_buckets
        ladder = row_buckets()
        assert ladder == sorted(ladder) and len(ladder) >= 6
        assert pick_row_bucket(ladder[0]) == ladder[0]
        assert pick_row_bucket(ladder[0] + 1) == ladder[1]


class TestPackedForwardParity:
    @pytest.mark.parametrize("pooling", ["mean", "cls"])
    def test_matches_unpacked(self, small_model, pooling):
        from dataclasses import replace
        config, params = small_model
        config = replace(config, pooling=pooling)
        seqs = _ragged_sequences(9, 20, seed=2)
        batch = pack_sequences(seqs, seq_len=24)

        packed = np.asarray(encode_tokens_packed(
            params, jnp.asarray(batch.input_ids),
            jnp.asarray(batch.segment_ids), jnp.asarray(batch.positions),
            jnp.asarray(batch.seq_index), batch.n_sequences, config,
            compute_dtype=jnp.float32))

        for i, seq in enumerate(seqs):
            ids = np.asarray(seq, dtype=np.int32)[None, :]
            mask = np.ones_like(ids)
            ref = np.asarray(encode_tokens(
                params, jnp.asarray(ids), jnp.asarray(mask), config,
                compute_dtype=jnp.float32))[0]
            np.testing.assert_allclose(packed[i], ref, atol=2e-5,
                                       err_msg=f"sequence {i}")

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
