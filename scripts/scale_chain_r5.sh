#!/bin/bash
# Unattended driver for the round-5 scale validation: runs EVERY stage
# of scripts/scale_run_r5.sh in order — world generation, both stage-1
# trainers (supervised, --max_restarts), discovery, scoring,
# post+eval, merge, CAD, and both dense-tail A/Bs — with no manual
# intervention (VERDICT r4 missing #4: the r4 chain waited on
# checkpoints that nothing in the committed scripts produced).
#
# Launch detached:
#   nohup bash scripts/scale_chain_r5.sh > /root/scale_r5/chain.log 2>&1 &
#
# A failed step is recorded in $WORK/failed_steps.txt and the chain
# continues (later steps that depend on it will fail fast and be
# recorded too — each can be retried alone via scale_run_r5.sh <step>).
set -uo pipefail

REPO=${REPO:-/root/repo}
WORK=${WORK:-/root/scale_r5}
export REPO WORK
mkdir -p "$WORK"

say() { echo "$(date -u +%F' '%T) [chain] $*"; }

run_step() { # step name
  local step=$1
  say "=== $step start ==="
  if bash "$REPO/scripts/scale_run_r5.sh" "$step" >> "$WORK/${step}.log" 2>&1; then
    say "=== $step OK ==="
  else
    say "=== $step FAILED (exit $?) — continuing to allow manual retry ==="
    echo "$step" >> "$WORK/failed_steps.txt"
  fi
}

# STEPS overrides the stage list (the slow-lane smoke test trims the
# A/B legs, whose reference-rounds cost is not tiny-world-boundable)
STEPS=${STEPS:-"step_world step_stage1 step_existence step_discovery \
step_scoring step_post_eval step_merge step_cad step_max_active_ab \
step_sticky_ab"}
for step in $STEPS; do
  run_step "$step"
done
say "chain complete"
