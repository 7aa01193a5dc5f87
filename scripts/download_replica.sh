#!/bin/bash
# Replica RGB-D (nice-slam processed mirror) — reference download_replica.sh.
# Requires network access (not available in the CI image).
set -e
mkdir -p dataset
cd dataset
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
rm Replica.zip
