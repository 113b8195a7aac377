#!/usr/bin/env bash
# Detached solver submission with babysitting — analog of the reference's
# submit_cfd_silent.sh (PID file, stale-job detection, timestamped logs).
# Usage: submit_cfd_silent.sh <deck file> [runluw args...]
set -euo pipefail

DECK="${1:?usage: submit_cfd_silent.sh <deck> [args...]}"
shift || true
DECK="$(cd "$(dirname "$DECK")" && pwd)/$(basename "$DECK")"
HOME_DIR="$(dirname "$DECK")"
LUW_HOME="${LUW_HOME:-$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)}"
PIDFILE="$HOME_DIR/proj_temp/solver.pid"
LOGDIR="$HOME_DIR/proj_temp"
mkdir -p "$LOGDIR"

if [[ -f "$PIDFILE" ]]; then
    OLD=$(cat "$PIDFILE" 2>/dev/null || echo "")
    if [[ -n "$OLD" ]] && kill -0 "$OLD" 2>/dev/null; then
        echo "A solver is already running for this case (pid $OLD). Abort."
        exit 1
    fi
    echo "Removing stale pid file (pid $OLD is gone)."
    rm -f "$PIDFILE"
fi

TS=$(date +%Y%m%d_%H%M%S)
LOG="$LOGDIR/solver_$TS.log"
export PYTHONPATH="$LUW_HOME${PYTHONPATH:+:$PYTHONPATH}"
nohup python3 -m latticeurbanwind_tpu.cli.dispatch runluw "$DECK" "$@" \
    > "$LOG" 2>&1 &
PID=$!
echo "$PID" > "$PIDFILE"
echo "Solver submitted: pid $PID, log $LOG"
