#!/bin/bash
# On-device A/B campaign for the round-3 training-path flavors, tunnel-safe.
#
# Round-robins every job that has not yet succeeded (marker: "=== success"
# in its log) so a long axon outage delays all jobs equally. One python
# process at a time, each run to completion (never kill a TPU client);
# 120 s gap after a success, 900 s backoff after a failure burst.
#
# Decisions these measurements gate (see docs/FINETUNE.md):
#   ab-opt   -> make the fused clip+Adam the cli/train default?
#   ab-mlp   -> flip EVT_TRAIN_MLP default to 'saved' (<= ViT-L)?
#   ab-attn  -> confirm the saved-qkv default is a win
#   ab-wide  -> confirm the saved-operand wide dW default at ViT-L
#   grad-check (b) -> first on-device run of the bf16 G8-vs-G2 tile check
#
# Usage: bash scripts/tpu_ab_campaign.sh [logdir]   (default /tmp)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp}

declare -A JOBS=(
  [tpu_ab_opt]="--size b --batch 64 --fused --ab-opt --reps 5"
  [tpu_gradcheck_b]="--size b --batch 64 --fused --grad-check --reps 3"
  [tpu_ab_mlp]="--size b --batch 64 --fused --ab-mlp --reps 5"
  [tpu_ab_attn]="--size b --batch 64 --fused --ab-attn --reps 5"
  [tpu_ab_wide]="--size l --batch 64 --fused --ab-wide --reps 5"
)
ORDER=(tpu_ab_opt tpu_gradcheck_b tpu_ab_mlp tpu_ab_attn tpu_ab_wide)

for round in $(seq 1 12); do
  any_fail=0
  for name in "${ORDER[@]}"; do
    log="$LOGDIR/$name.log"
    grep -q "=== success" "$log" 2>/dev/null && continue
    echo "=== round $round: ${JOBS[$name]} ($(date -u +%H:%M:%S)) ===" >> "$log"
    if python scripts/bench_train.py ${JOBS[$name]} >> "$log" 2>&1; then
      echo "=== success ===" >> "$log"
      sleep 120
    else
      echo "=== failed (round $round) ===" >> "$log"
      any_fail=1
      break   # tunnel down; don't burn the other jobs this round
    fi
  done
  all_done=1
  for name in "${ORDER[@]}"; do
    grep -q "=== success" "$LOGDIR/$name.log" 2>/dev/null || all_done=0
  done
  [ "$all_done" = 1 ] && { echo ALL_JOBS_DONE; exit 0; }
  [ "$any_fail" = 1 ] && sleep 900
done
echo RUNNER_EXHAUSTED
exit 1
