#!/bin/bash
# Watch training progress (reference: scripts/monitor_training.sh).
# Polls data/training/training_status.json and tails the serve log.
DATA_ROOT="${DATA_ROOT:-./data}"
STATUS="$DATA_ROOT/training/training_status.json"
while true; do
  clear
  echo "== lameness-tpu training monitor ($(date +%T)) =="
  if [ -f "$STATUS" ]; then
    python -c "import json; print(json.dumps(json.load(open('$STATUS')), indent=2))"
  else
    echo "no training run recorded yet ($STATUS missing)"
  fi
  [ -f "$DATA_ROOT/serve.log" ] && {
    echo; echo "-- recent training log lines --"
    grep -E "training|train" "$DATA_ROOT/serve.log" | tail -5
  }
  sleep "${INTERVAL:-10}"
done
