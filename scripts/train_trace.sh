#!/usr/bin/env bash
# TRACE video training (counterpart of trace/train_video.py launch)
set -e
python -m romp_tpu.train.launch --config configs/trace.yml "$@"
