#!/usr/bin/env bash
# Launch marqo-tpu (parity: reference run_marqo.sh — co-deployed vs external
# store selection via env vars).
#
#   MARQO_ENGINE_QUERY_URL   — set to use an external engine shard server;
#                              unset = in-process engine (single container)
#   MARQO_ENGINE_DATA_DIR    — persist index settings (default: ephemeral)
#   MARQO_MODELS_TO_PRELOAD  — JSON list of models to warm at startup
set -euo pipefail

PORT="${MARQO_PORT:-8882}"
HOST="${MARQO_HOST:-0.0.0.0}"

if [[ "${1:-}" == "engine" ]]; then
    # run a standalone engine shard (reference: external Vespa role)
    exec python -m marqo_tpu.engine.server
fi

echo "Starting marqo-tpu API on ${HOST}:${PORT}"
exec python -c "from marqo_tpu.api.app import main; main(host='${HOST}', port=${PORT})"
