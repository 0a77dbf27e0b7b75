#!/bin/bash
# Round-5 generalization training driver: runs the vanilla and
# with-prev legs sequentially through the chunked-resume loop
# (PERF.md "Platform quirks": the axon plugin leaks host RSS at the
# batch-upload rate, so long legs run as bounded-step process chunks;
# exit code 3 = "relaunch me". A 60 s pause between chunk processes
# avoids the tunnel grant-claim wedge.)
#
# Usage: bash benchmarks/run_genrun_r5.sh [steps] [min_steps]
set -u
export PATH=/opt/venv/bin:$PATH
cd /root/repo

STEPS=${1:-7000}
MIN_STEPS=${2:-5000}
LOG=benchmarks/runs/genrun_easy_r5.log
ERR=/tmp/genrun_r5.stderr

for model in vanilla withprev; do
  attempt=0
  while true; do
    attempt=$((attempt + 1))
    echo "# --- $model chunk process #$attempt ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout 4500 python benchmarks/dev_generalization_e2e.py \
      --preset easy --songs 1024 --heldout 8 \
      --workdir .genrun_easy \
      --steps "$STEPS" --min-steps "$MIN_STEPS" \
      --chunk-steps 3000 --no-tier \
      --models "$model" >> "$LOG" 2>> "$ERR" &
    echo $! > /tmp/genrun_r5.pid
    wait $!
    rc=$?
    if [ $rc -eq 3 ]; then
      sleep 60   # let the device grant clear before the next claimant
      continue
    fi
    if [ $rc -eq 124 ]; then
      echo "# $model chunk #$attempt hit the 4500s process timeout (likely a tunnel wedge); retrying after 120s" >> "$LOG"
      sleep 120
      continue
    fi
    echo "# $model leg finished rc=$rc ($(date -u +%H:%M))" >> "$LOG"
    break
  done
  sleep 60
done
echo "# run_genrun_r5.sh complete ($(date -u +%H:%M))" >> "$LOG"
