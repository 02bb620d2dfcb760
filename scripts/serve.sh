#!/usr/bin/env bash
# Unified launcher (analog of reference scripts/serve.sh:3-17 which picks
# between its three backends). Backends here:
#   engine  — wf-tpu continuous-batching engine (default; real model)
#   tiny    — random tiny model (smoke tests, no weights needed)
#
# Env: WF_MODEL (HF id or packed dir), WF_PORT (30000), WF_HOST (0.0.0.0),
#      WF_BACKEND (engine|tiny), WF_SLOTS (16), SKIP_GCS_CACHE
set -euo pipefail

BACKEND="${WF_BACKEND:-engine}"
PORT="${WF_PORT:-30000}"
HOST="${WF_HOST:-0.0.0.0}"
MODEL="${WF_MODEL:-microsoft/bitnet-b1.58-2B-4T}"
SLOTS="${WF_SLOTS:-16}"

cd "$(dirname "$0")/.."

case "$BACKEND" in
  tiny)
    exec python -m wrinklefree_tpu.server --tiny --host "$HOST" --port "$PORT"
    ;;
  engine)
    exec python -m wrinklefree_tpu.server \
      --model "$MODEL" --host "$HOST" --port "$PORT" --max-batch "$SLOTS"
    ;;
  *)
    echo "unknown WF_BACKEND=$BACKEND (engine|tiny)" >&2
    exit 1
    ;;
esac
