#!/bin/bash
# TUM-RGBD benchmark sequences — reference download_tum.sh.
# Requires network access (not available in the CI image).
set -e
mkdir -p dataset/TUM
cd dataset/TUM
download() {
  local fr=$1 seq=$2
  wget "https://cvg.cit.tum.de/rgbd/dataset/$fr/$seq.tgz"
  tar -xzf "$seq.tgz"
  rm "$seq.tgz"
}
download freiburg1 rgbd_dataset_freiburg1_desk
download freiburg2 rgbd_dataset_freiburg2_xyz
download freiburg3 rgbd_dataset_freiburg3_long_office_household
