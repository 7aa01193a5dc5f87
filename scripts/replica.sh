#!/bin/bash
# Replica sweep — the reference's replica.sh with the published per-scene
# tuning (replica.sh:135-142): overlapped_th=5e-4, mcd=0.02, th2=5e-5,
# ds=10, kf_th=0.7.  Pass --unlimited for the >30FPS mode (replica_unlimit).
set -e
DATA_ROOT=${DATA_ROOT:-dataset/Replica}
OUT_ROOT=${OUT_ROOT:-output/Replica}
EXTRA=${EXTRA:-}

for scene in room0 room1 room2 office0 office1 office2 office3 office4; do
  echo "=== $scene ==="
  python -m gs_icp_slam_tpu run \
    --dataset_type replica \
    --dataset_path "$DATA_ROOT/$scene" \
    --output_path "$OUT_ROOT/$scene" \
    --downsample_rate 10 \
    --max_correspondence_distance 0.02 \
    --keyframe_th 0.7 \
    --overlapped_th 5e-4 \
    --overlapped_th2 5e-5 \
    --trackable_opacity_th 0.05 \
    --save_results $EXTRA \
    | tee "$OUT_ROOT/$scene.log"
done
