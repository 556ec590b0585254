#! /bin/bash
# GCL training on nuScenes-as-KITTI (reference scripts/train_gcl_nuscenes.sh).
export PATH_POSTFIX=$1
export MISC_ARGS=$2
export NUSCENES_PATH=${NUSCENES_PATH:-/data/nuscenes_kitti}
TRAIN_DATASET=ColocationNuscenesDataset DATASET=PairComplementNuscenesDataset \
KITTI_PATH=${NUSCENES_PATH} bash scripts/train_gcl_kitti.sh "$PATH_POSTFIX" \
  "--use_old_pose true $MISC_ARGS"
