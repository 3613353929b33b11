#!/bin/bash
# Download the three TUM RGB-D sequences used by the TUM_RGBD configs.
set -e
mkdir -p Datasets/TUM_RGBD
cd Datasets/TUM_RGBD
for seq in \
  rgbd_dataset_freiburg1_desk \
  rgbd_dataset_freiburg2_xyz \
  rgbd_dataset_freiburg3_long_office_household; do
  f1=$(echo "$seq" | sed 's/rgbd_dataset_\(freiburg[0-9]\).*/\1/')
  wget "https://cvg.cit.tum.de/rgbd/dataset/${f1}/${seq}.tgz"
  tar -xvzf "${seq}.tgz"
done
