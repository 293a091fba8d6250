"""HTTP load generator for the search API.

Parity: reference perf_tests/ (locust harness: users/spawn-rate/duration vs
:8882, random_index_and_tensor_search.py; locust.conf). locust is not baked
into this image, so the harness is self-contained: N worker threads issue
add-documents and search traffic against a running server and report
latency percentiles + QPS.

Usage:
    python perf_tests/loadgen.py --host http://localhost:8882 \
        --users 8 --duration 30 --index perf-index --model test
"""

import argparse
import json
import random
import statistics
import string
import threading
import time
from collections import defaultdict

import httpx

WORDS = ["red", "green", "blue", "apple", "pear", "car", "vehicle", "house",
         "river", "mountain", "cloud", "guitar", "piano", "coffee", "tea",
         "engine", "window", "garden", "silver", "golden"]


def random_sentence(n_words=12):
    return " ".join(random.choices(WORDS, k=n_words))


def setup_index(host: str, index: str, model: str, n_docs: int):
    client = httpx.Client(base_url=host, timeout=60)
    client.delete(f"/indexes/{index}")
    r = client.post(f"/indexes/{index}", json={"model": model})
    r.raise_for_status()
    for start in range(0, n_docs, 64):
        docs = [{"_id": f"doc{start + i}", "title": random_sentence(6),
                 "body": random_sentence(30)}
                for i in range(min(64, n_docs - start))]
        r = client.post(f"/indexes/{index}/documents",
                        json={"documents": docs,
                              "tensorFields": ["title", "body"]})
        r.raise_for_status()
    client.close()


def worker(host, index, duration, latencies, errors, search_ratio=0.9):
    client = httpx.Client(base_url=host, timeout=30)
    deadline = time.time() + duration
    while time.time() < deadline:
        op = "search" if random.random() < search_ratio else "add"
        start = time.perf_counter()
        try:
            if op == "search":
                method = random.choice(["TENSOR", "LEXICAL", "HYBRID"])
                r = client.post(f"/indexes/{index}/search",
                                json={"q": random_sentence(4),
                                      "searchMethod": method, "limit": 10})
            else:
                r = client.post(
                    f"/indexes/{index}/documents",
                    json={"documents": [{"title": random_sentence(6),
                                         "body": random_sentence(30)}],
                          "tensorFields": ["title", "body"]})
            elapsed = (time.perf_counter() - start) * 1000
            if r.status_code == 200:
                latencies[op].append(elapsed)
            else:
                errors[op] += 1
        except Exception:
            errors[op] += 1
    client.close()


def percentile(values, p):
    if not values:
        return None
    values = sorted(values)
    idx = min(len(values) - 1, int(round(p / 100 * (len(values) - 1))))
    return values[idx]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="http://localhost:8882")
    parser.add_argument("--users", type=int, default=8)
    parser.add_argument("--duration", type=float, default=30)
    parser.add_argument("--index", default="perf-index")
    parser.add_argument("--model", default="test")
    parser.add_argument("--seed-docs", type=int, default=256)
    args = parser.parse_args()

    print(f"Seeding {args.seed_docs} docs into {args.index}...")
    setup_index(args.host, args.index, args.model, args.seed_docs)

    latencies = defaultdict(list)
    errors = defaultdict(int)
    threads = [threading.Thread(target=worker,
                                args=(args.host, args.index, args.duration,
                                      latencies, errors))
               for _ in range(args.users)]
    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - start

    report = {"users": args.users, "duration_s": round(wall, 1)}
    for op, values in latencies.items():
        report[op] = {
            "requests": len(values),
            "qps": round(len(values) / wall, 1),
            "p50_ms": round(percentile(values, 50), 1),
            "p95_ms": round(percentile(values, 95), 1),
            "p99_ms": round(percentile(values, 99), 1),
            "errors": errors[op],
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
