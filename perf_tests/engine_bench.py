"""Native engine scale benchmark: HNSW build/query/recall + memory, and
BM25 indexing/query rates.

Runs entirely on CPU (the C++ engine); complements bench.py (TPU embedding
throughput). The HNSW section measures the full scale profile the engine
claims (reference README.md:47 "hundred-million document indexes" via Vespa
content nodes): build rate, peak RSS, a vectors/GB capacity figure, QPS and
p50/p99 latency with a recall@10 sweep over ef, and save/load round-trip
time. Usage:

    python perf_tests/engine_bench.py [--n 1000000] [--dim 768] [--k 10] \
        [--cell bfloat16] [--ef-sweep 10,50,100,200,800] [--threads 0] \
        [--skip-bm25]
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from marqo_tpu.engine.native import NativeBm25, NativeHnsw, native_available
from marqo_tpu.engine.store import np_cell_dtype


def _rss_gb() -> float:
    # ru_maxrss is KiB on Linux
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024


def make_corpus(n: int, dim: int, n_queries: int, clustered: bool = True):
    """``clustered`` mimics real embedding geometry (mixture of Gaussians);
    uniform random vectors are HNSW's pathological worst case (verified:
    recall 1.00 clustered vs 0.18 uniform at 50k x 384, ef=100) and do not
    represent production corpora."""
    rng = np.random.default_rng(0)
    if clustered:
        centers = rng.standard_normal((max(8, n // 250), dim)).astype(
            np.float32) * 3
        data = centers[rng.integers(0, len(centers), n)] + \
            rng.standard_normal((n, dim)).astype(np.float32)
        queries = centers[rng.integers(0, len(centers), n_queries)] + \
            rng.standard_normal((n_queries, dim)).astype(np.float32)
    else:
        data = rng.standard_normal((n, dim)).astype(np.float32)
        queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return data, queries


def brute_force_topk(data: np.ndarray, queries: np.ndarray, k: int,
                     block: int = 200_000) -> list:
    """Exact top-k by blocked matmul (bounds the fp32 scratch at
    n_queries × block)."""
    n = data.shape[0]
    nq = queries.shape[0]
    best_sims = np.full((nq, k), -np.inf, dtype=np.float32)
    best_ids = np.zeros((nq, k), dtype=np.int64)
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        sims = queries @ np.asarray(data[lo:hi], dtype=np.float32).T
        cat_sims = np.concatenate([best_sims, sims], axis=1)
        cat_ids = np.concatenate(
            [best_ids, np.tile(np.arange(lo, hi), (nq, 1))], axis=1)
        part = np.argpartition(-cat_sims, k - 1, axis=1)[:, :k]
        best_sims = np.take_along_axis(cat_sims, part, axis=1)
        best_ids = np.take_along_axis(cat_ids, part, axis=1)
    return [set(best_ids[i].tolist()) for i in range(nq)]


def bench_hnsw(n: int, dim: int, k: int, ef_sweep, n_queries: int = 200,
               clustered: bool = True, cell: str = "float32",
               m: int = 16, ef_construction: int = 512, threads: int = 0,
               save_path: str = "", load_path: str = ""):
    data, queries = make_corpus(n, dim, n_queries, clustered)
    store = np.ascontiguousarray(data, dtype=np_cell_dtype(cell))
    if cell != "float32":
        del data  # the cell store is the single copy, as in production
        data = store
    rss_before = _rss_gb()

    if load_path:
        # Search-only mode over a previously-built graph (same corpus seed):
        # lets ef-sweep experiments skip the hours-long 1-core build.
        with open(load_path, "rb") as f:
            index = NativeHnsw.load(f.read())
        assert len(index) == n, (len(index), n)
        build_s = float("nan")
    else:
        index = NativeHnsw(dim, m=m, ef_construction=ef_construction,
                           cell_dtype=cell)
        start = time.perf_counter()
        index.link(store, n, n_threads=threads)
        build_s = time.perf_counter() - start
    rss_after_build = _rss_gb()
    if save_path and not load_path:
        with open(save_path, "wb") as f:
            f.write(bytes(index.save()))

    truth = brute_force_topk(store, queries, k)

    sweep = {}
    for ef in ef_sweep:
        lat = []
        recalls = []
        for qi, q in enumerate(queries):
            t0 = time.perf_counter()
            ids, _ = index.search(store, q, k=k, ef=ef)
            lat.append(time.perf_counter() - t0)
            recalls.append(len(truth[qi] & set(ids.tolist())) / k)
        lat = np.sort(np.asarray(lat))
        sweep[str(ef)] = {
            "qps": round(n_queries / float(lat.sum()), 1),
            "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 3),
            "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1000, 3),
            "recall_at_k": round(float(np.mean(recalls)), 4),
        }

    # save/load round-trip (graph-only blob + the store array)
    t0 = time.perf_counter()
    blob = index.save()
    save_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    restored = NativeHnsw.load(blob)
    load_s = time.perf_counter() - t0
    assert len(restored) == n

    vec_gb = store.nbytes / 1024 ** 3
    graph_gb = len(blob) / 1024 ** 3
    return {
        "n_vectors": n, "dim": dim, "k": k, "cell_dtype": cell,
        "m": m, "ef_construction": ef_construction,
        "build_s": round(build_s, 1) if build_s == build_s else None,
        "build_vectors_per_s":
            round(n / build_s, 1) if build_s == build_s else None,
        "vectors_gb": round(vec_gb, 3),
        "graph_blob_gb": round(graph_gb, 3),
        "rss_gb_before": round(rss_before, 3),
        "rss_gb_after_build": round(rss_after_build, 3),
        "vectors_per_gb": int(n / max(vec_gb + graph_gb, 1e-9)),
        "save_s": round(save_s, 2),
        "load_s": round(load_s, 2),
        "ef_sweep": sweep,
    }


def bench_bm25(n_docs: int = 50000, n_queries: int = 500):
    rng = np.random.default_rng(0)
    vocab = [f"term{i}" for i in range(5000)]
    index = NativeBm25()
    start = time.perf_counter()
    for i in range(n_docs):
        words = rng.choice(vocab, size=rng.integers(20, 80))
        index.add(i, " ".join(words))
    build_s = time.perf_counter() - start
    start = time.perf_counter()
    for _ in range(n_queries):
        terms = " ".join(rng.choice(vocab, size=3))
        index.score(terms)
    query_s = time.perf_counter() - start
    return {
        "n_docs": n_docs,
        "index_docs_per_s": round(n_docs / build_s, 1),
        "query_qps": round(n_queries / query_s, 1),
        "query_p50_ms": round(query_s / n_queries * 1000, 3),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--ef-sweep", type=str, default="10,50,100,200,800")
    parser.add_argument("--cell", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--m", type=int, default=16)
    parser.add_argument("--efc", type=int, default=512)
    parser.add_argument("--threads", type=int, default=0,
                        help="build threads (0 = all cores)")
    parser.add_argument("--queries", type=int, default=200)
    parser.add_argument("--uniform", action="store_true",
                        help="worst-case uniform random vectors")
    parser.add_argument("--skip-bm25", action="store_true")
    parser.add_argument("--save-path", type=str, default="",
                        help="write the built graph blob here for reuse")
    parser.add_argument("--load-path", type=str, default="",
                        help="skip the build; load a graph blob built from "
                             "the same corpus seed/config")
    args = parser.parse_args()
    if not native_available():
        print(json.dumps({"error": "native engine unavailable"}))
        return
    ef_sweep = [int(x) for x in args.ef_sweep.split(",") if x]
    report = {
        "hnsw": bench_hnsw(args.n, args.dim, args.k, ef_sweep,
                           n_queries=args.queries,
                           clustered=not args.uniform, cell=args.cell,
                           m=args.m, ef_construction=args.efc,
                           threads=args.threads, save_path=args.save_path,
                           load_path=args.load_path),
    }
    if not args.skip_bm25:
        report["bm25"] = bench_bm25()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
