#!/usr/bin/env bash
# Build the GraspNet-OS image directory from GraspNet-1Billion.
# Annotations come as released COCO JSONs (see datasets/README.md).
set -e
DATA_DIR=${DATA_DIR:-datasets/graspnet}
GRASPNET_ORIGIN_DIR=${GRASPNET_ORIGIN_DIR:-datasets/graspnet_1billion}
mkdir -p "$DATA_DIR"/images
python "$(dirname "$0")"/prep/prepare_graspnet_data.py --dataset_path "$GRASPNET_ORIGIN_DIR" --image_destination "$DATA_DIR"/images
