#!/usr/bin/env bash
# Motion export launcher (counterpart of scripts/export_fbx.sh): per-track
# BVH (FBX when bpy is installed) from a video run's video_results.npz.
set -euo pipefail
python -m romp_tpu.tools.export_motion "$@"
