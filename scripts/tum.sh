#!/bin/bash
# TUM-RGBD sweep — the reference's tum.sh tuning (tum.sh:135-142):
# overlapped_th=1e-3, mcd=0.03, trackable_opacity_th=0.09, th2=1e-3,
# ds=5, kf_th=0.81.
set -e
DATA_ROOT=${DATA_ROOT:-dataset/TUM}
OUT_ROOT=${OUT_ROOT:-output/TUM}
EXTRA=${EXTRA:-}

for scene in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz \
             rgbd_dataset_freiburg3_long_office_household; do
  echo "=== $scene ==="
  python -m gs_icp_slam_tpu run \
    --dataset_type tum \
    --dataset_path "$DATA_ROOT/$scene" \
    --output_path "$OUT_ROOT/$scene" \
    --downsample_rate 5 \
    --max_correspondence_distance 0.03 \
    --keyframe_th 0.81 \
    --overlapped_th 1e-3 \
    --overlapped_th2 1e-3 \
    --trackable_opacity_th 0.09 \
    --save_results $EXTRA \
    | tee "$OUT_ROOT/$scene.log"
done
