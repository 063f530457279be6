#!/bin/bash
# Replica (NICE-SLAM prepack; reference scripts/download_replica.sh).
mkdir -p datasets && cd datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip -d replica_tmp && mv replica_tmp/Replica replica && rm -rf replica_tmp Replica.zip
