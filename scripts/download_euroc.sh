#!/bin/bash
# EuRoC MH_02 (reference scripts/download_euroc.sh).
mkdir -p datasets/euroc && cd datasets/euroc
wget http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_02_easy/MH_02_easy.zip
mkdir -p mh02 && unzip MH_02_easy.zip -d mh02 && rm MH_02_easy.zip
