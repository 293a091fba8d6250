#!/usr/bin/env bash
# Multi-worker / multi-shard scale benchmark (VERDICT r3 item 8).
#
# On any multi-core host, launches the API with N workers (SO_REUSEPORT
# fork model, api/app.py:496) over M engine shards served by a standalone
# engine server, drives ingest + search load at each worker count, and
# reports throughput scaling vs N. This makes the "production hosts scale
# host-bound stages ~N x" claim (BENCH_NOTES) runnable the moment
# multi-core hardware is available; on a 1-core box it still executes but
# no speedup is expected.
#
# Usage: scripts/scale_bench.sh [max_workers] [shards] [duration_s]
set -euo pipefail

MAX_WORKERS="${1:-2}"
SHARDS="${2:-2}"
DURATION="${3:-15}"
PORT="${MARQO_SCALE_BENCH_PORT:-8899}"
ENGINE_PORT="${MARQO_SCALE_BENCH_ENGINE_PORT:-8898}"
DATA_DIR="$(mktemp -d /tmp/marqo-scale-bench.XXXXXX)"
cd "$(dirname "$0")/.."

cleanup() {
    [[ -f /tmp/scale_bench_api.pid ]] && kill "$(cat /tmp/scale_bench_api.pid)" 2>/dev/null || true
    [[ -f /tmp/scale_bench_engine.pid ]] && kill "$(cat /tmp/scale_bench_engine.pid)" 2>/dev/null || true
    rm -rf "$DATA_DIR"
}
trap cleanup EXIT

echo "== engine server: $SHARDS shards on :$ENGINE_PORT =="
MARQO_ENGINE_SHARDS="$SHARDS" MARQO_ENGINE_DATA_DIR="$DATA_DIR" \
    python -c "
import jax; jax.config.update('jax_platforms', 'cpu')  # axon ignores env var
from marqo_tpu.engine.server import main
main(host='127.0.0.1', port=$ENGINE_PORT, n_shards=$SHARDS)
" &
echo $! > /tmp/scale_bench_engine.pid
sleep 3

for N in $(seq 1 "$MAX_WORKERS"); do
    echo "== $N API worker(s) on :$PORT =="
    MARQO_API_WORKERS="$N" \
    MARQO_ENGINE_QUERY_URL="http://127.0.0.1:$ENGINE_PORT" \
    MARQO_MODELS_TO_PRELOAD="[]" \
    MARQO_COORDINATION_BACKEND=file \
    MARQO_COORDINATION_DIR="$DATA_DIR/coord" \
        python -c "
import jax; jax.config.update('jax_platforms', 'cpu')  # axon ignores env var
from marqo_tpu.api.app import main
main(host='127.0.0.1', port=$PORT)
" &
    echo $! > /tmp/scale_bench_api.pid
    for i in $(seq 1 40); do
        curl -sf "http://127.0.0.1:$PORT/health" >/dev/null 2>&1 && break
        sleep 0.5
    done
    python perf_tests/loadgen.py --host "http://127.0.0.1:$PORT" \
        --users $((N * 2)) --duration "$DURATION" \
        --index "scale-bench-$N" --model test \
        | tee "/tmp/scale_bench_result_${N}.json"
    kill "$(cat /tmp/scale_bench_api.pid)" 2>/dev/null || true
    rm -f /tmp/scale_bench_api.pid
    sleep 2
done

echo "== scaling summary =="
python - <<'EOF'
import glob, json, re
rows = []
for path in sorted(glob.glob("/tmp/scale_bench_result_*.json")):
    n = int(re.search(r"_(\d+)\.json", path).group(1))
    try:
        with open(path) as f:
            text = f.read()
        payload = json.loads(text[text.index("{"):])
        rows.append((n, payload))
    except Exception as e:
        print(f"workers={n}: unparsable result ({e})")
rows.sort()
base = None
for n, payload in rows:
    qps = payload.get("search", {}).get("qps") or payload.get("qps")
    if base is None and qps:
        base = qps
    scale = f"{qps / base:.2f}x" if (base and qps) else "n/a"
    print(f"workers={n}: search_qps={qps} scaling={scale}")
EOF
