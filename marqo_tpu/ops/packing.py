"""Sequence packing: multiple documents per encoder row.

The reference pads every text to the model max length inside torch batches
(hugging_face_model.py encode); at seq 128 a 30-token passage wastes 77% of
the MXU work. We greedy-pack ragged token sequences into fixed (B, S) rows
with per-token segment ids; attention is block-diagonal by segment (no
cross-contamination — verified by parity tests) and pooling is a
segment-sum. Static shapes are preserved: rows are padded to a (B, S)
bucket, so XLA compiles once per bucket.

This is the main lever for the ≥10k docs/sec/chip target: effective
throughput multiplies by (seq_bucket / mean_tokens).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np


class PackedBatch:
    """Host-side packing result.

    input_ids:    (B, S) int32
    segment_ids:  (B, S) int32 — 0 = padding, k>0 = k-th sequence in the row
    positions:    (B, S) int32 — position within the owning sequence
    seq_index:    (B, S) int32 — global output row for each token (-1 = pad)
    n_sequences:  number of packed sequences
    """

    def __init__(self, input_ids, segment_ids, positions, seq_index,
                 n_sequences: int):
        self.input_ids = input_ids
        self.segment_ids = segment_ids
        self.positions = positions
        self.seq_index = seq_index
        self.n_sequences = n_sequences


MAX_SEGMENTS_PER_ROW = 15  # one-hot width cap for the fold-in mask trick


def pack_sequences(sequences: List[List[int]], seq_len: int,
                   pad_id: int = 0,
                   row_bucket: int = 8,
                   row_buckets: Optional[Sequence[int]] = None) -> PackedBatch:
    """Greedy first-fit-decreasing packing of token id lists into rows of
    width ``seq_len``. Sequences longer than seq_len are truncated. The row
    count is padded up to a multiple of ``row_bucket`` — or, when
    ``row_buckets`` is given, to the smallest ladder entry ≥ the row count —
    to bound the compile cache (serving traffic's token mass varies batch to
    batch; without a coarse ladder every new row count is a fresh XLA
    compile). At most MAX_SEGMENTS_PER_ROW sequences share a row.
    """
    n = len(sequences)
    order = sorted(range(n), key=lambda i: -len(sequences[i]))
    rows: List[List[Tuple[int, List[int]]]] = []  # [(orig_idx, ids)]
    space: List[int] = []
    for i in order:
        ids = sequences[i][:seq_len]
        placed = False
        for r in range(len(rows)):
            if space[r] >= len(ids) and len(rows[r]) < MAX_SEGMENTS_PER_ROW:
                rows[r].append((i, ids))
                space[r] -= len(ids)
                placed = True
                break
        if not placed:
            rows.append([(i, ids)])
            space.append(seq_len - len(ids))

    n_rows = len(rows)
    if row_buckets:
        ladder = sorted(row_buckets)
        B = next((b for b in ladder if n_rows <= b), None)
        if B is None:  # beyond the ladder: fall back to multiples of the top
            top = ladder[-1]
            B = ((n_rows + top - 1) // top) * top
    else:
        padded_rows = ((n_rows + row_bucket - 1) // row_bucket) * row_bucket
        B = max(padded_rows, row_bucket)
    input_ids = np.full((B, seq_len), pad_id, dtype=np.int32)
    segment_ids = np.zeros((B, seq_len), dtype=np.int32)
    positions = np.zeros((B, seq_len), dtype=np.int32)
    seq_index = np.full((B, seq_len), -1, dtype=np.int32)
    for r, row in enumerate(rows):
        cursor = 0
        for seg, (orig_idx, ids) in enumerate(row, start=1):
            L = len(ids)
            input_ids[r, cursor:cursor + L] = ids
            segment_ids[r, cursor:cursor + L] = seg
            positions[r, cursor:cursor + L] = np.arange(L)
            seq_index[r, cursor:cursor + L] = orig_idx
            cursor += L
    return PackedBatch(input_ids, segment_ids, positions, seq_index, n)


def packing_efficiency(batch: PackedBatch) -> float:
    """Fraction of token slots carrying real tokens."""
    return float((batch.segment_ids > 0).mean())
