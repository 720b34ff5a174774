#!/usr/bin/env bash
# Crash-restart training monitor (reference `train.sh:1-40`): launch the
# trainer, poll, log device state on death, relaunch; pairs with
# --resume latest so restarts continue from the last checkpoint.
set -u

LOG_DIR=${LOG_DIR:-logs}
mkdir -p "$LOG_DIR"
RESTART_DELAY=${RESTART_DELAY:-15}

while true; do
  ts=$(date +%Y%m%d_%H%M%S)
  echo "[monitor] launching trainer at $ts"
  python "$(dirname "$0")/sft.py" "$@" 2>&1 | tee -a "$LOG_DIR/train_$ts.log"
  code=$?
  echo "[monitor] trainer exited with code $code at $(date)"
  if [ "$code" -eq 0 ]; then
    echo "[monitor] clean exit — done"
    break
  fi
  python - <<'EOF' >> "$LOG_DIR/crash_$ts.log" 2>&1 || true
import jax
print("devices:", jax.devices())
for d in jax.devices():
    try:
        print(d, d.memory_stats())
    except Exception as e:
        print(d, "no stats:", e)
EOF
  echo "[monitor] restarting in ${RESTART_DELAY}s"
  sleep "$RESTART_DELAY"
done
