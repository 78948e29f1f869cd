#!/usr/bin/env bash
# 2D-pose backbone pretraining (counterpart of the reference scripts/pretrain.sh)
set -e
python -m romp_tpu.train.pretrain --config configs/pretrain.yml "$@"
