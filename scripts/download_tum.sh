#!/bin/bash
# TUM RGB-D sequences used by the configs (reference scripts/download_tum.sh).
mkdir -p datasets/tum && cd datasets/tum
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz rgbd_dataset_freiburg3_long_office_household; do
  wget https://cvg.cit.tum.de/rgbd/dataset/$(echo $seq | sed 's/rgbd_dataset_\(freiburg[0-9]\).*/\1/')/$seq.tgz
  tar -xvzf $seq.tgz && rm $seq.tgz
done
