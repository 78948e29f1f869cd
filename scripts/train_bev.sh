#!/usr/bin/env bash
# BEV training (counterpart of V6_train.sh / V6_ft.sh).
set -euo pipefail
CONFIG=${1:-configs/v6_bev.yml}
shift || true
python -m romp_tpu.train.launch --config "$CONFIG" "$@"
