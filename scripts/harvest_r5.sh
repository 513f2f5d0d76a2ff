#!/bin/bash
# Unattended end-of-chain harvest for the round-5 scale validation.
# Waits for scale_chain_r5.sh to print "chain complete", then folds the
# work dir's evidence into the repo tree so an end-of-round auto-commit
# captures it even with no operator attached:
#   * scripts/scale_report_r5.json       (scale_report.py over $WORK)
#   * scripts/discovery_stats_r5.json    (parse_discovery_stats output)
#   * scripts/ap_score_pseudo_r5.json    (COCO_evaluator pseudo-label AP)
#   * scripts/recorded_stage2_load.json  (bench headline load refreshed
#     from THIS run's segment logs — the basis string names the run)
#
#   nohup bash scripts/harvest_r5.sh > /root/scale_r5/harvest.log 2>&1 &
set -uo pipefail
REPO=${REPO:-/root/repo}
WORK=${WORK:-/root/scale_r5}
say() { echo "$(date -u +%F' '%T) [harvest] $*"; }

say "waiting for chain completion"
until grep -q "chain complete" "$WORK/chain.log" 2>/dev/null; do sleep 60; done
say "chain complete — assembling"

python "$REPO/scripts/scale_report.py" --work "$WORK" \
  --out "$WORK/scale_report.json" > /dev/null \
  && cp -f "$WORK/scale_report.json" "$REPO/scripts/scale_report_r5.json" \
  && say "scale_report_r5.json landed"

[ -f "$WORK/discovery_stats_r5.json" ] \
  && cp -f "$WORK/discovery_stats_r5.json" "$REPO/scripts/discovery_stats_r5.json" \
  && say "discovery_stats_r5.json landed"

[ -f "$WORK/ap_score_pseudo.json" ] \
  && cp -f "$WORK/ap_score_pseudo.json" "$REPO/scripts/ap_score_pseudo_r5.json" \
  && say "ap_score_pseudo_r5.json landed"

# Refresh the bench headline's recorded load from this run's logs.
N_SEGS=$(ls "$WORK"/disc_r5_*_*.log 2>/dev/null | wc -l)
if [ "$N_SEGS" -gt 0 ]; then
  python "$REPO/scripts/record_stage2_load.py" "$WORK"/disc_r5_*_*.log \
    --out "$REPO/scripts/recorded_stage2_load.json" \
    --basis "500-scene world full run ($N_SEGS segments, incl. all 100 dense scenes), r5 final chain" \
    && say "recorded_stage2_load.json refreshed"
fi
say "harvest complete"
