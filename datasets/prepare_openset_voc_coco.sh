#!/usr/bin/env bash
# Build the VOC-COCO open-set benchmark directory (OpenDet protocol).
# Expects: datasets/coco (train2017+val2017+annotations), datasets/VOC2007,
# datasets/VOC2012. Mirrors the reference pipeline
# (datasets/opendet2_utils/prepare_openset_voc_coco.sh).
set -e

DATA_DIR=${DATA_DIR:-datasets/voc_coco}
COCO_DIR=${COCO_DIR:-datasets/coco}
VOC07_DIR=${VOC07_DIR:-datasets/VOC2007}
VOC12_DIR=${VOC12_DIR:-datasets/VOC2012}
PREP=$(dirname "$0")/prep

echo "== dirs =="
mkdir -p "$DATA_DIR"/{Annotations,JPEGImages,ImageSets/Main}

echo "== images =="
cp -r "$COCO_DIR"/train2017/. "$DATA_DIR"/JPEGImages/
cp "$COCO_DIR"/val2017/* "$DATA_DIR"/JPEGImages/
cp "$VOC07_DIR"/JPEGImages/* "$DATA_DIR"/JPEGImages/
cp "$VOC12_DIR"/JPEGImages/* "$DATA_DIR"/JPEGImages/

echo "== coco -> voc xml =="
python "$PREP"/coco_to_voc.py --dir "$DATA_DIR" --ann_path "$COCO_DIR"/annotations/instances_train2017.json
python "$PREP"/coco_to_voc.py --dir "$DATA_DIR" --ann_path "$COCO_DIR"/annotations/instances_val2017.json

echo "== voc annotations + lists =="
cp "$VOC07_DIR"/Annotations/* "$DATA_DIR"/Annotations/
cp "$VOC12_DIR"/Annotations/* "$DATA_DIR"/Annotations/
cp "$VOC07_DIR"/ImageSets/Main/train.txt "$DATA_DIR"/ImageSets/Main/voc07train.txt
cp "$VOC07_DIR"/ImageSets/Main/val.txt "$DATA_DIR"/ImageSets/Main/voc07val.txt
cp "$VOC07_DIR"/ImageSets/Main/test.txt "$DATA_DIR"/ImageSets/Main/voc07test.txt
cp "$VOC12_DIR"/ImageSets/Main/trainval.txt "$DATA_DIR"/ImageSets/Main/voc12trainval.txt

echo "== class-incremental subsets (20-40 / 20-60 / 20-80) =="
python "$PREP"/make_openset_splits.py cls-specific --dir "$DATA_DIR" --out_split instances_train2017_cls_spe_20_40 --start_class 20 --end_class 40 --pre_num_sample 8000 --post_num_sample 5000
python "$PREP"/make_openset_splits.py cls-specific --dir "$DATA_DIR" --out_split instances_train2017_cls_spe_20_60 --start_class 20 --end_class 60 --pre_num_sample 16000 --post_num_sample 10000
python "$PREP"/make_openset_splits.py cls-specific --dir "$DATA_DIR" --out_split instances_train2017_cls_spe_20_80 --start_class 20 --end_class 80 --pre_num_sample 24000 --post_num_sample 15000

echo "== image-incremental subsets (2500/5000/10000/20000) =="
for n in 2500 5000 10000 20000; do
  python "$PREP"/make_openset_splits.py cls-agnostic --dir "$DATA_DIR" --out_split instances_train2017_cls_agn_$n --start_class 20 --end_class 80 --post_num_sample $n
done

echo "== compose final test lists =="
compose() { cat "$DATA_DIR"/ImageSets/Main/voc07test.txt "$DATA_DIR"/ImageSets/Main/$1.txt > "$DATA_DIR"/ImageSets/Main/$2.txt; }
cat "$DATA_DIR"/ImageSets/Main/voc07val.txt "$DATA_DIR"/ImageSets/Main/instances_val2017.txt > "$DATA_DIR"/ImageSets/Main/voc_coco_val.txt
compose instances_train2017_cls_spe_20_40 voc_coco_20_40_test
compose instances_train2017_cls_spe_20_60 voc_coco_20_60_test
compose instances_train2017_cls_spe_20_80 voc_coco_20_80_test
compose instances_train2017_cls_agn_2500 voc_coco_2500_test
compose instances_train2017_cls_agn_5000 voc_coco_5000_test
compose instances_train2017_cls_agn_10000 voc_coco_10000_test
compose instances_train2017_cls_agn_20000 voc_coco_20000_test

echo "done. NOTE: to reproduce the published numbers exactly, use the"
echo "reference repo's checked-in ImageSets lists (same benchmark subsets)"
echo "instead of regenerating them with a different RNG."
