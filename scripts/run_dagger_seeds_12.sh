#!/bin/bash
# Round-4 DAgger rerun, seeds 1-2 (seed 0 completed 21:08; the chain was
# interrupted mid-seed-1). dagger_train.py reuses cached trajs_round{k}.npz
# in the workdir, so seed 1 resumes from its round-0..3 collection cache.
set -u
cd "$(dirname "$0")/.."
for S in 1 2; do
  echo "=== seed $S start $(date -u +%H:%M:%S) ==="
  timeout 14400 python scripts/dagger_train.py --tpu --seed "$S" \
    --max-z-drift-m 3.0 --chunk-frames 40 --weighted-aggregate \
    --workdir "/tmp/doa_dagger_r4_seed$S" \
    > "/tmp/dagger_r4_s$S.log" 2>&1
  echo "=== seed $S exit $? $(date -u +%H:%M:%S) ==="
done
echo "ALL SEEDS DONE"
