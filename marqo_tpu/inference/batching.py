"""Static-shape bucketing for XLA compile-once execution.

XLA traces/compiles per shape; serving traffic has ragged batch and sequence
sizes. We pad every encode to a (batch, seq) bucket from a small fixed grid
so the steady state hits only cached executables. This replaces the
reference's fixed torch batch=16 loop (s2_inference.py:123-158,
MARQO_MAX_VECTORISE_BATCH_SIZE) with a TPU-friendly scheme: large batches to
fill the MXU, a bounded compile-cache footprint.
"""

from typing import Iterator, List, Sequence, Tuple

from marqo_tpu.api import configs


def _buckets(var: str) -> List[int]:
    vals = [int(v) for v in configs.read_env_vars_and_defaults_list(var)]
    return sorted(set(vals))


def seq_buckets() -> List[int]:
    return _buckets("MARQO_TPU_COMPILE_BUCKETS")


def batch_buckets() -> List[int]:
    return _buckets("MARQO_TPU_BATCH_BUCKETS")


def pick_bucket(value: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ value (largest bucket if value exceeds all)."""
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def pick_seq_bucket(max_len: int) -> int:
    return pick_bucket(max_len, seq_buckets())


def pick_batch_bucket(n: int) -> int:
    return pick_bucket(n, batch_buckets())


def row_buckets() -> List[int]:
    """Row-count grid for sequence-packed batches (ops/packing.py). Packed
    row counts track the token mass of a request, which varies batch to
    batch; padding rows to a coarse ladder (≤ ~15% waste) keeps the XLA
    compile cache hot in steady state instead of recompiling per row count."""
    return _buckets("MARQO_TPU_ROW_BUCKETS")


def pick_row_bucket(n: int) -> int:
    """Smallest ladder entry ≥ n; beyond the ladder, the next multiple of
    the top entry (NEVER clamps — a packed batch sized by this must hold
    every row, matching ops/packing.py's overflow rule)."""
    ladder = row_buckets()
    top = ladder[-1]
    if n > top:
        return ((n + top - 1) // top) * top
    return pick_bucket(n, ladder)


def batched_device_encode(array, forward, pad_value=0):
    """Pad ``array`` rows to batch buckets, dispatch EVERY device batch
    through ``forward``, then drain the fetches (dispatch is eager on the
    TPU backend, so transfer of batch i overlaps compute of batch i+1 —
    the ingest-path pattern from loaders._dispatch_padded, shared by every
    CLIP-family wrapper). Returns the concatenated fetched rows."""
    import numpy as np
    n = array.shape[0]
    # under a serving mesh the batch axis shards across dp, so buckets
    # round up to dp multiples (harmless extra pad rows otherwise)
    from marqo_tpu.parallel.serving import round_up_to_dp, serving_mesh
    bucket = round_up_to_dp(pick_batch_bucket(n), serving_mesh())
    pending = []
    start = 0
    while start < n:
        size = min(bucket, n - start)
        padded = np.full((bucket,) + array.shape[1:], pad_value,
                         dtype=array.dtype)
        padded[:size] = array[start:start + size]
        pending.append((forward(padded), size))
        start += size
    import jax
    # one batched fetch amortizes the fixed host-device roundtrip
    fetched = jax.device_get([emb for emb, _ in pending])
    return np.concatenate(
        [arr[:size] for arr, (_, size) in zip(fetched, pending)], axis=0)


def iter_batches(n_items: int, max_batch: int) -> Iterator[Tuple[int, int]]:
    """Yield (start, size) chunks of at most max_batch items."""
    start = 0
    while start < n_items:
        size = min(max_batch, n_items - start)
        yield start, size
        start += size


def generate_batches(seq: List, batch_size: int) -> Iterator[List]:
    """Parity helper (reference tensor_search/utils.py:334 generate_batches)."""
    if batch_size <= 0:
        from marqo_tpu.exceptions import InvalidArgumentError
        raise InvalidArgumentError("Batch size must be greater than 0")
    for start, size in iter_batches(len(seq), batch_size):
        yield seq[start:start + size]
