#!/usr/bin/env bash
# Batch driver: sweep cameras x NIPs x regularization strengths for the joint
# manipulation-classification workflow (parity with the reference batch script).
set -e
CAMERAS=${CAMERAS:-"SyntheticCam"}
NIPS=${NIPS:-"INet UNet"}
LNS=${LNS:-"0.05 0.1 0.5"}
EPOCHS=${EPOCHS:-1001}
for cam in $CAMERAS; do
  for nip in $NIPS; do
    python3 train_manipulation.py --cam "$cam" --nip "$nip" --train nip \
        --ln $LNS --jpeg 50 --ds pool --epochs "$EPOCHS" "$@"
  done
done
