#!/bin/bash
# Round-4 DAgger rerun: prove the seeds-1/2 collapse is cured at the source.
#
# Recipe (VERDICT r3 item 1): drift-bounded collection on the measured
# poison separator (--max-z-drift-m 3.0, scripts/drift_probe.py: expert
# z-drift <= 2.3 m vs ~11 m for collapsing policies) + 2-second sequence
# chunking (--chunk-frames 40, the measured 0.0 -> 0.36 lever) +
# proximity-weighted aggregation (the deployed round-3 recipe).
# Seeds run sequentially: one TPU chip.
set -u
cd "$(dirname "$0")/.."
for S in 0 1 2; do
  echo "=== seed $S start $(date -u +%H:%M:%S) ==="
  timeout 14400 python scripts/dagger_train.py --tpu --seed "$S" \
    --max-z-drift-m 3.0 --chunk-frames 40 --weighted-aggregate \
    --workdir "/tmp/doa_dagger_r4_seed$S" \
    > "/tmp/dagger_r4_s$S.log" 2>&1
  echo "=== seed $S exit $? $(date -u +%H:%M:%S) ==="
done
echo "ALL SEEDS DONE"
