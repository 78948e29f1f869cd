"""Measure single-image ROMP CLI latency (the interactive/webcam path).

Usage: python scripts/cli_latency.py [--frames 20] [--render]
Prints p50/p90 per-frame ms through the full Python API (preprocess +
device round trips + unmapping + optional host render).
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--render", action="store_true")
    args = ap.parse_args()

    from romp_tpu.cli.romp import ROMP, romp_settings

    settings = romp_settings(
        ["-m", "webcam", "-o", "/tmp/cli_latency_out"]
        + (["--render_mesh"] if args.render else []))
    model = ROMP(settings)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    model(frame)                                  # compile
    ts = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        model(frame)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.sort(ts)
    import jax

    print(json.dumps({
        "p50_ms": round(float(np.percentile(ts, 50)), 1),
        "p90_ms": round(float(np.percentile(ts, 90)), 1),
        "fps": round(1e3 / float(np.percentile(ts, 50)), 1),
        "render": args.render,
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
