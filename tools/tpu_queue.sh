#!/bin/bash
# Serialized TPU measurement queue runner (replaces the one-shot
# tpu_ab_queue*.sh scripts of rounds 1-4).
#
# Usage:
#   tools/tpu_queue.sh <queue-file> [log-file]
#
# The queue file holds one shell command per line (blank lines and #
# comments skipped). Commands run SEQUENTIALLY — one TPU process at a time
# (concurrent processes corrupt two-point timings in both directions, see
# CLAUDE.md) — with NO kill timeouts (the tunnel wedges if TPU-using
# processes die mid-session). Each command is logged with its wall time and
# exit status; a failing command does not stop the queue.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

QUEUE="${1:?usage: tpu_queue.sh <queue-file> [log-file]}"
LOG="${2:-/tmp/tpu_queue.log}"
exec >> "$LOG" 2>&1

echo "=== tpu_queue $QUEUE start $(date) ==="
n=0
while IFS= read -r cmd || [ -n "$cmd" ]; do
    # strip leading whitespace so indented comments/blank lines skip too
    trimmed="${cmd#"${cmd%%[![:space:]]*}"}"
    case "$trimmed" in ''|'#'*) continue;; esac
    n=$((n + 1))
    echo "--- [$n] $cmd ($(date +%T)) ---"
    t0=$SECONDS
    bash -c "$cmd"
    rc=$?
    echo "--- [$n] rc=$rc elapsed=$((SECONDS - t0))s ---"
done < "$QUEUE"
echo "=== tpu_queue $QUEUE done $(date) ==="
