#!/bin/bash
# Lameness-TPU single-host deployment.
#
# The reference's deploy.sh orchestrates a 22-container docker-compose
# stack + Postgres migrations; this framework collapses to ONE process
# (engine + bus + API + UI) plus an optional NATS broker for external
# consumers, so deployment is: sanity-check the environment, start the
# broker (optional), start the app, probe health.
#
# Environment overrides:
#   DATA_ROOT      (default ./data)      data + sqlite + checkpoints
#   API_PORT       (default 8000)        admin REST/WS/UI port
#   NATS_PORT      (default 4222)        broker port; NATS=0 disables
#   CLIP_BATCH     (default 1)           clips per fused engine batch
#   ASYNC=1                              worker-pool bus dispatch
#   SMALL=1                              test-geometry engine (CI only)
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data}"
API_PORT="${API_PORT:-8000}"
NATS_PORT="${NATS_PORT:-4222}"
CLIP_BATCH="${CLIP_BATCH:-1}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO_DIR"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"

log()  { echo -e "\033[0;34m[deploy]\033[0m $*"; }
ok()   { echo -e "\033[0;32m[deploy]\033[0m $*"; }
fail() { echo -e "\033[0;31m[deploy]\033[0m $*" >&2; exit 1; }

# -- sanity checks -----------------------------------------------------------
python - <<'PY' || fail "python environment is missing core deps"
import jax, flax, optax, numpy, cv2  # noqa
PY
ok "python environment ok (jax $(python -c 'import jax; print(jax.__version__)'))"
mkdir -p "$DATA_ROOT"

# -- optional NATS broker ------------------------------------------------------
NATS_ARGS=()
if [ "${NATS:-1}" != "0" ]; then
  if ! (exec 3<>"/dev/tcp/127.0.0.1/$NATS_PORT") 2>/dev/null; then
    log "starting first-party NATS broker on :$NATS_PORT"
    nohup python -m lameness_tpu nats-server --port "$NATS_PORT" \
      > "$DATA_ROOT/nats.log" 2>&1 &
    echo $! > "$DATA_ROOT/nats.pid"
    sleep 1
  else
    exec 3>&-
    log "NATS broker already listening on :$NATS_PORT"
  fi
  NATS_ARGS=(--nats-url "nats://127.0.0.1:$NATS_PORT")
fi

# -- app -----------------------------------------------------------------------
SERVE_ARGS=(--data "$DATA_ROOT" serve --port "$API_PORT"
            --batch "$CLIP_BATCH" "${NATS_ARGS[@]}")
[ "${ASYNC:-0}" = "1" ] && SERVE_ARGS+=(--async)
[ "${SMALL:-0}" = "1" ] && SERVE_ARGS+=(--small)

log "starting lameness-tpu: python -m lameness_tpu ${SERVE_ARGS[*]}"
nohup python -m lameness_tpu "${SERVE_ARGS[@]}" \
  > "$DATA_ROOT/serve.log" 2>&1 &
echo $! > "$DATA_ROOT/serve.pid"

# -- health probe ----------------------------------------------------------------
for i in $(seq 1 60); do
  if curl -fsS "http://127.0.0.1:$API_PORT/health" >/dev/null 2>&1; then
    ok "API healthy at http://127.0.0.1:$API_PORT (UI at /)"
    ok "initial admin passwords: grep 'initial password' $DATA_ROOT/serve.log"
    ok "stop with: kill \$(cat $DATA_ROOT/serve.pid) \$(cat $DATA_ROOT/nats.pid 2>/dev/null)"
    exit 0
  fi
  sleep 1
done
fail "API did not become healthy in 60s — see $DATA_ROOT/serve.log"
