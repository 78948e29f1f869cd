#!/usr/bin/env bash
# Webcam demo (counterpart of scripts/webcam*.sh).
set -euo pipefail
romp -m webcam --show --render_mesh --temporal_optimize "$@"
