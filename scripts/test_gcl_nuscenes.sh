#! /bin/bash
# Benchmark a trained GCL model on nuScenes (reference scripts/test_gcl_nuscenes.sh).
export SAVE_DIR=$1
export MISC_ARGS=$2
export NUSCENES_PATH=${NUSCENES_PATH:-/data/nuscenes_kitti}
export LoNUSCENES=${LoNUSCENES:-false}
export USE_RANSAC=${USE_RANSAC:-false}

python scripts/test_kitti.py \
	--save_dir ${SAVE_DIR} \
	--kitti_root ${NUSCENES_PATH} \
	--LoNUSCENES ${LoNUSCENES} \
	--use_RANSAC ${USE_RANSAC} \
	$MISC_ARGS
