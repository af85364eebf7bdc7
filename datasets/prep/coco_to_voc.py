#!/usr/bin/env python
"""Convert COCO-json annotations to VOC-style XML + an ImageSet list.

Equivalent of the reference's datasets/opendet2_utils/convert_coco_to_voc.py:
COCO class names are remapped to their VOC spellings, boxes get the VOC
+1-pixel 1-based corner convention, difficult=0, and an ImageSets/Main list
named after the json is emitted. Uses the framework's CocoJson reader (no
pycocotools).
"""
from __future__ import annotations

import argparse
import os
import sys
import xml.etree.cElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from openset_rcnn_tpu.data.coco import CocoJson  # noqa: E402

COCO2VOC = {
    "airplane": "aeroplane",
    "dining table": "diningtable",
    "motorcycle": "motorbike",
    "potted plant": "pottedplant",
    "couch": "sofa",
    "tv": "tvmonitor",
}


def convert(ann_path: str, target_dir: str) -> None:
    os.makedirs(os.path.join(target_dir, "Annotations"), exist_ok=True)
    coco = CocoJson(ann_path)
    image_ids = []
    for img_id, anns in coco.img_to_anns.items():
        img = coco.imgs[img_id]
        root = ET.Element("annotation")
        ET.SubElement(root, "filename").text = img["file_name"]
        size = ET.SubElement(root, "size")
        ET.SubElement(size, "width").text = str(img["width"])
        ET.SubElement(size, "height").text = str(img["height"])
        ET.SubElement(size, "depth").text = "3"
        for ann in anns:
            name = coco.cats[ann["category_id"]]["name"]
            obj = ET.SubElement(root, "object")
            ET.SubElement(obj, "name").text = COCO2VOC.get(name, name)
            ET.SubElement(obj, "difficult").text = "0"
            x, y, w, h = ann["bbox"]
            bb = ET.SubElement(obj, "bndbox")
            ET.SubElement(bb, "xmin").text = str(int(x + 1.0))
            ET.SubElement(bb, "ymin").text = str(int(y + 1.0))
            ET.SubElement(bb, "xmax").text = str(int(x + w + 1.0))
            ET.SubElement(bb, "ymax").text = str(int(y + h + 1.0))
        stem = img["file_name"].split(".")[0]
        image_ids.append(stem)
        ET.ElementTree(root).write(os.path.join(target_dir, "Annotations", stem + ".xml"))

    listdir = os.path.join(target_dir, "ImageSets", "Main")
    os.makedirs(listdir, exist_ok=True)
    listname = os.path.basename(ann_path).split(".json")[0] + ".txt"
    with open(os.path.join(listdir, listname), "w") as f:
        f.write("\n".join(image_ids) + "\n")
    print(f"wrote {len(image_ids)} annotations to {target_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="datasets/voc_coco")
    p.add_argument("--ann_path", default="datasets/coco/annotations/instances_train2017.json")
    a = p.parse_args()
    convert(a.ann_path, a.dir)
