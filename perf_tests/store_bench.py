"""Store-level scale benchmark: feed rate, snapshot/restore, WAL replay.

Complements engine_bench.py (raw HNSW profile): this measures the FULL
StoreEngine path — document feed with embeddings (WAL append per doc),
snapshot write, cold restore (docs + tensors + graph blob), and WAL replay
rate — the durability-path numbers the Vespa transactionlog/document-store
roles carry in the reference. Usage:

    python perf_tests/store_bench.py [--docs 20000] [--chunks 5] \
        [--dim 768] [--cell bfloat16]

(docs × chunks = total vectors; 20k × 5 = 100k vectors default.)
"""

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.store import StoreEngine
from marqo_tpu.engine.wal import WriteAheadLog


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=20_000)
    parser.add_argument("--chunks", type=int, default=5)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--cell", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()

    n_vectors = args.docs * args.chunks
    rng = np.random.default_rng(0)
    work = tempfile.mkdtemp(prefix="store_bench_")
    try:
        descriptor = IndexDescriptor(
            name="sb", model_dimensions=args.dim, cell_dtype=args.cell,
            tensor_fields=[TensorFieldDescriptor(
                name="v", dimensions=args.dim,
                distance_metric="prenormalized-angular")])

        # -- feed with WAL attached (the production ingest write path) --
        eng = StoreEngine()
        wal = WriteAheadLog(os.path.join(work, "wal.log"))
        eng.attach_wal(wal)
        eng.create_index(descriptor)
        t0 = time.perf_counter()
        for d in range(args.docs):
            vecs = rng.standard_normal(
                (args.chunks, args.dim)).astype(np.float32)
            eng.feed("sb", f"d{d}", {"n": d, "title": f"document {d}"},
                     {"v": {"chunks": [f"c{i}" for i in range(args.chunks)],
                            "embeddings": vecs}})
        feed_s = time.perf_counter() - t0
        wal_bytes = wal.size_bytes()
        wal.close()

        # materialize the HNSW (query once) so the snapshot carries the
        # graph blob, as a warmed production node's would
        q = rng.standard_normal(args.dim).astype(np.float32)
        eng.query_tensor("sb", q, limit=10, approximate=True)

        # -- snapshot --
        snap_dir = os.path.join(work, "snap")
        t0 = time.perf_counter()
        eng.snapshot(snap_dir)
        snapshot_s = time.perf_counter() - t0
        snap_bytes = sum(
            os.path.getsize(os.path.join(snap_dir, f))
            for f in os.listdir(snap_dir))

        # -- cold restore (docs + tensors + graph, no rebuild) --
        restored = StoreEngine()
        t0 = time.perf_counter()
        restored.restore(snap_dir)
        restore_s = time.perf_counter() - t0
        assert restored.vector_count("sb") == n_vectors

        # -- WAL replay into an empty engine (crash-without-snapshot) --
        replayer = StoreEngine()
        replay_wal = WriteAheadLog(os.path.join(work, "wal.log"))
        t0 = time.perf_counter()
        applied = replayer.replay_wal(replay_wal)
        replay_s = time.perf_counter() - t0
        replay_wal.close()
        assert replayer.vector_count("sb") == n_vectors

        print(json.dumps({
            "docs": args.docs, "chunks_per_doc": args.chunks,
            "n_vectors": n_vectors, "dim": args.dim, "cell": args.cell,
            "feed_docs_per_s": round(args.docs / feed_s, 1),
            "feed_vectors_per_s": round(n_vectors / feed_s, 1),
            "wal_gb": round(wal_bytes / 1024 ** 3, 3),
            "snapshot_s": round(snapshot_s, 2),
            "snapshot_gb": round(snap_bytes / 1024 ** 3, 3),
            "restore_s": round(restore_s, 2),
            "wal_replay_s": round(replay_s, 2),
            "wal_replay_docs_per_s": round(applied / replay_s, 1),
            "rss_gb": round(_rss_gb(), 2),
        }, indent=2))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
