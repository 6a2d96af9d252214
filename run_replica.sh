#!/bin/bash
# Full Replica pipeline per scene (reference replica.sh equivalent).
# Scenes run sequentially on the chip; flip to backgrounded invocations with
# distinct JAX processes for job-level parallelism across hosts.
set -e
scenes=${SCENES:-"room_0 room_1 room_2 office_0 office_1 office_2 office_3 office_4"}
for scene in $scenes; do
  cfg=configs/replica/${scene}.yaml
  echo "=== $scene ==="
  python -m splatloc_tpu.cli.train_decoder  --config $cfg
  python -m splatloc_tpu.cli.train_gaussians --config $cfg
  python -m splatloc_tpu.cli.test --config $cfg --eval_pose --eval_rendering
  python -m splatloc_tpu.cli.test --config $cfg --eval_selection --landmark_num 5000
done
