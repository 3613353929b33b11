#!/bin/bash
# Download the culled ground-truth Replica meshes used by the
# reconstruction evaluation (see BASELINE.md / tools/eval_recon.py).
set -e
mkdir -p Datasets/Replica
cd Datasets/Replica
wget https://cvg-data.inf.ethz.ch/nice-slam/data/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
