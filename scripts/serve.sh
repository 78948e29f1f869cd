#!/usr/bin/env bash
# Micro-batched inference serving (ROMP by default; --model bev for all-age).
# Precompiles every padded batch size before opening the port.
exec python -m romp_tpu.serve --precompile "$@"
