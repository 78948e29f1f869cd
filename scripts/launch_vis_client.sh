#!/usr/bin/env bash
# Remote-visualization consumer (counterpart of scripts/launch_vis_server.sh;
# inverted roles: here the inference CLI hosts the socket via --socket_stream
# and this client consumes — headless print/record instead of an Open3D
# window; use --save out.npz + vis/world_view.py for offline 3D viewing).
set -euo pipefail
python -m romp_tpu.vis.socket_server "$@"
