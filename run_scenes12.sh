#!/bin/bash
# Full 12-Scenes pipeline per scene (reference scenes12.sh equivalent).
set -e
scenes=${SCENES:-"apt1_kitchen apt1_living apt2_bed apt2_kitchen apt2_living apt2_luke of1_gates362 of1_gates381 of1_lounge of1_manolis of2_5a of2_5b"}
for scene in $scenes; do
  cfg=configs/scenes12/${scene}.yaml
  echo "=== $scene ==="
  python -m splatloc_tpu.cli.train_decoder  --config $cfg
  python -m splatloc_tpu.cli.train_gaussians --config $cfg
  python -m splatloc_tpu.cli.test --config $cfg --eval_pose --eval_rendering
  python -m splatloc_tpu.cli.test --config $cfg --eval_selection --landmark_num 5000
done
