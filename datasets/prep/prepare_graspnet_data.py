#!/usr/bin/env python
"""Flatten GraspNet-1Billion realsense RGB frames into sequentially numbered
images/ (equivalent of datasets/openset_rcnn_utils/prepare_graspnet_data.py).
The released GraspNet-OS COCO-JSON annotations index into this numbering.
"""
from __future__ import annotations

import argparse
import glob
import os
from shutil import copyfile

FOLDERS = ["train_1", "train_2", "train_3", "train_4", "test_seen", "test_similar", "test_novel"]


def flatten(dataset_path: str, image_destination: str) -> int:
    os.makedirs(image_destination, exist_ok=True)
    count = len(os.listdir(image_destination))
    for folder in FOLDERS:
        for scene in sorted(glob.glob(os.path.join(dataset_path, folder, "scene_*"))):
            frames = sorted(
                glob.glob(os.path.join(os.path.abspath(scene), "realsense", "rgb", "[0-9]" * 4 + ".png"))
            )
            for frame in frames:
                count += 1
                copyfile(frame, os.path.join(image_destination, f"{count:06d}.png"))
            print(f"{scene}: total {count}")
    return count


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--image_destination", required=True)
    a = p.parse_args()
    n = flatten(a.dataset_path, a.image_destination)
    print(f"done: {n} images")
