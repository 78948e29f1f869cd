#!/usr/bin/env bash
# Webcam -> Blender live mocap (counterpart of scripts/webcam_blender.sh):
# streams per-frame SMPL params over TCP; install romp_tpu/vis/blender_addon.py
# in Blender and press "Connect", or watch headlessly with
#   python -m romp_tpu.vis.socket_server --port 9999
set -euo pipefail
romp -m webcam -t --socket_stream --socket_port "${PORT:-9999}" "$@"
