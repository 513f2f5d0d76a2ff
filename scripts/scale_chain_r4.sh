#!/bin/bash
# Unattended driver for the round-4 scale validation: waits for the
# stage-1 + existence checkpoints, then runs the remaining runbook
# stages (scripts/scale_run_r4.sh) in order, logging to $WORK.
# Launch detached:  nohup bash scripts/scale_chain_r4.sh > /root/scale_r4/chain.log 2>&1 &
set -uo pipefail

REPO=/root/repo
WORK=${WORK:-/root/scale_r4}
OBJ_CKPT=$REPO/results_objectness/center_and_boundary/s1_r4/ckpt/iter_5000_model.ckpt
CLS_CKPT=$REPO/results_objectness/existence/exist_r4/ckpt/iter_500_model.ckpt
mkdir -p "$WORK"

say() { echo "$(date -u +%F' '%T) [chain] $*"; }

wait_for() { # path, label
  local path=$1 label=$2
  while [ ! -f "$path" ]; do
    say "waiting for $label ($path)"
    sleep 60
  done
  # writer streams leaves; wait until the file stops growing
  local prev=-1 cur
  cur=$(stat -c %s "$path")
  while [ "$cur" != "$prev" ]; do
    sleep 20
    prev=$cur
    cur=$(stat -c %s "$path")
  done
  say "$label ready ($cur bytes)"
}

run_step() { # step name
  local step=$1
  say "=== $step start ==="
  if bash "$REPO/scripts/scale_run_r4.sh" "$step" >> "$WORK/${step}.log" 2>&1; then
    say "=== $step OK ==="
  else
    say "=== $step FAILED (exit $?) — continuing to allow manual retry ==="
    echo "$step" >> "$WORK/failed_steps.txt"
  fi
}

wait_for "$OBJ_CKPT" "stage-1 final checkpoint"
wait_for "$CLS_CKPT" "existence classifier checkpoint"

run_step step_discovery
run_step step_scoring
run_step step_post_eval
run_step step_merge
run_step step_cad
run_step step_sticky_ab
say "chain complete"
