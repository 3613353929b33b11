#!/bin/bash
# Download the Replica RGB-D sequences (the NICE-SLAM preprocessing of the
# Replica dataset, same source the reference uses).
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
