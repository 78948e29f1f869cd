#!/usr/bin/env bash
# Single-image demo (counterpart of the reference's image demo launchers).
set -euo pipefail
romp -m image -i "${1:?usage: demo_image.sh <image> [out_dir]}" \
  -o "${2:-romp_out}" --render_mesh
