#!/usr/bin/env python
"""Build the OpenDet VOC-COCO open-set ImageSets.

One tool covering the reference's three split generators
(datasets/opendet2_utils/prepare_openset_voc_coco_cls_specific.py,
..._cls_agnostic.py, split_coco_trainval.py):

  cls-specific  — images containing classes [start, end) but no person and
                  nothing beyond `end`; class-balanced pre-sampling, then a
                  final uniform subsample;
  cls-agnostic  — images whose classes all lie in [start, end); uniform
                  subsample;
  split-trainval— per-class train/val split of a COCO annotation file.
"""
from __future__ import annotations

import argparse
import os
import random
import sys
import xml.etree.ElementTree as ET
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from openset_rcnn_tpu.data.voc import VOC_COCO_CATEGORIES  # noqa: E402

# the 80 detection classes (without the trailing "unknown")
CLASS_NAMES = tuple(VOC_COCO_CATEGORIES[:-1])


def _read_ids(dirname, split):
    with open(os.path.join(dirname, "ImageSets", "Main", split + ".txt")) as f:
        return [l.strip() for l in f if l.strip()]


def _write_ids(dirname, split, ids):
    path = os.path.join(dirname, "ImageSets", "Main", split + ".txt")
    with open(path, "w") as f:
        f.write("\n".join(ids) + "\n")
    print(f"wrote {len(ids)} ids -> {path}")


def _classes_of(dirname, fileid):
    tree = ET.parse(os.path.join(dirname, "Annotations", fileid + ".xml"))
    return [obj.find("name").text for obj in tree.findall("object")]


def cls_specific(dirname, in_split, out_split, start, end, pre_n, post_n, seed):
    rng = random.Random(seed)
    inside = set(CLASS_NAMES[start:end])
    beyond = set(CLASS_NAMES[end:])
    per_class = defaultdict(list)
    for fid in _read_ids(dirname, in_split):
        classes = _classes_of(dirname, fid)
        cset = set(classes)
        if (cset & inside) and "person" not in cset and not (cset & beyond):
            for c in classes:
                per_class[c].append(fid)

    total = sum(len(v) for v in per_class.values())
    ratio = float(pre_n) / max(total, 1)
    chosen = set()
    for c, fids in per_class.items():
        k = min(int(ratio * len(fids)), len(fids))
        chosen.update(rng.sample(fids, k))
    ids = sorted(chosen)
    ids = rng.sample(ids, min(post_n, len(ids)))
    _write_ids(dirname, out_split, ids)


def cls_agnostic(dirname, in_split, out_split, start, end, post_n, seed):
    rng = random.Random(seed)
    outside = set(CLASS_NAMES[:start]) | set(CLASS_NAMES[end:])
    ids = []
    for fid in _read_ids(dirname, in_split):
        if not (set(_classes_of(dirname, fid)) & outside):
            ids.append(fid)
    ids = sorted(set(ids))
    ids = rng.sample(ids, min(post_n, len(ids)))
    _write_ids(dirname, out_split, ids)


def split_trainval(ann_path, out_dir, min_sample=10, max_sample=50, seed=0):
    from openset_rcnn_tpu.data.coco import CocoJson

    rng = random.Random(seed)
    coco = CocoJson(ann_path)
    per_class = defaultdict(set)
    for img_id, anns in coco.img_to_anns.items():
        stem = coco.imgs[img_id]["file_name"].split(".")[0]
        for ann in anns:
            per_class[coco.cats[ann["category_id"]]["name"]].add(stem)

    min_count = min(len(v) for v in per_class.values())
    train, val = set(), set()
    for c, stems in per_class.items():
        stems = sorted(stems)
        rng.shuffle(stems)
        k = min(int(len(stems) / min_count * min_sample), max_sample)
        val.update(stems[:k])
        train.update(stems[k:])
    train -= val
    os.makedirs(os.path.join(out_dir, "ImageSets", "Main"), exist_ok=True)
    _write_ids(out_dir, "instances_train2017_train", sorted(train))
    _write_ids(out_dir, "instances_train2017_val", sorted(val))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("cls-specific")
    s.add_argument("--dir", default="datasets/voc_coco")
    s.add_argument("--in_split", default="instances_train2017")
    s.add_argument("--out_split", required=True)
    s.add_argument("--start_class", type=int, default=20)
    s.add_argument("--end_class", type=int, default=40)
    s.add_argument("--pre_num_sample", type=int, default=8000)
    s.add_argument("--post_num_sample", type=int, default=5000)
    s.add_argument("--seed", type=int, default=0)

    a = sub.add_parser("cls-agnostic")
    a.add_argument("--dir", default="datasets/voc_coco")
    a.add_argument("--in_split", default="instances_train2017")
    a.add_argument("--out_split", required=True)
    a.add_argument("--start_class", type=int, default=20)
    a.add_argument("--end_class", type=int, default=80)
    a.add_argument("--post_num_sample", type=int, default=5000)
    a.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("split-trainval")
    t.add_argument("--dir", default="datasets/voc_coco")
    t.add_argument("--ann_path", default="datasets/coco/annotations/instances_train2017.json")
    t.add_argument("--seed", type=int, default=0)

    args = p.parse_args()
    if args.cmd == "cls-specific":
        cls_specific(
            args.dir, args.in_split, args.out_split, args.start_class,
            args.end_class, args.pre_num_sample, args.post_num_sample, args.seed,
        )
    elif args.cmd == "cls-agnostic":
        cls_agnostic(
            args.dir, args.in_split, args.out_split, args.start_class,
            args.end_class, args.post_num_sample, args.seed,
        )
    else:
        split_trainval(args.ann_path, args.dir, seed=args.seed)
