"""Convert released torch checkpoints (ROMP.pkl / BEV.pth / TRACE ...) to
native .npz parameter archives (no torch needed at inference time).

Equivalent of `simple_romp/tools/convert_checkpoints.py`, extended with an
exhaustive shape check against the freshly initialized architecture.
"""
from __future__ import annotations

import argparse
import sys

import jax


def main(input_args=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", type=str, help="torch checkpoint path")
    parser.add_argument("output", type=str, help="output .npz path")
    parser.add_argument("--arch", type=str, default="romp",
                        choices=["romp", "romp_resnet", "bev", "trace",
                                 "raft", "none"],
                        help="architecture to validate coverage against")
    args = parser.parse_args(input_args)

    from romp_tpu.utils.checkpoint import (
        check_params_match, load_torch_checkpoint, save_params,
    )

    params = load_torch_checkpoint(args.input)
    params.pop("coordmap_3d", None)  # BEV registered buffer, rebuilt at init

    if args.arch != "none":
        if args.arch == "romp":
            from romp_tpu.models.romp import init_romp_params

            init = init_romp_params(jax.random.PRNGKey(0))
        elif args.arch == "romp_resnet":
            from romp_tpu.models.romp import init_romp_params

            init = init_romp_params(jax.random.PRNGKey(0),
                                    backbone="resnet50")
        elif args.arch == "bev":
            from romp_tpu.models.bev import init_bev_params

            init = init_bev_params(jax.random.PRNGKey(0))
        elif args.arch == "trace":
            from romp_tpu.models.trace import init_trace_params

            init = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
        else:
            from romp_tpu.models.raft import (
                filter_raft_state_dict, init_raft_params,
            )

            params = filter_raft_state_dict(params)
            init = init_raft_params(jax.random.PRNGKey(0))
        check_params_match(params, init)
        print(f"coverage check OK ({len(params)} tensors)")

    save_params(args.output, params)
    print(f"converted {args.input} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
