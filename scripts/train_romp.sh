#!/usr/bin/env bash
# ROMP training (counterpart of the reference's V1_train.sh /
# train_distributed.sh — no torchrun needed: one SPMD process drives the
# whole mesh; multi-host pods use `jax.distributed.initialize` via env).
set -euo pipefail
CONFIG=${1:-configs/v1.yml}
shift || true
python -m romp_tpu.train.launch --config "$CONFIG" "$@"
