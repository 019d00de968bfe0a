#!/usr/bin/env bash
# Batch driver: re-validate trained FAN workflows across datasets
# (parity with the reference test_fan_batch.sh).
set -e
RUNS_ROOT=${RUNS_ROOT:-"data/m"}
DATASETS=${DATASETS:-"data/raw/training_data/SyntheticCam"}
for run in $(find "$RUNS_ROOT" -name training.json -exec dirname {} \;); do
  for data in $DATASETS; do
    echo "== $run on $data"
    python3 test_fan.py --run-dir "$run" --data "$data" "$@" || true
  done
done
