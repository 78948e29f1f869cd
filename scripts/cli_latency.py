"""Measure single-image ROMP CLI latency (the interactive/webcam path).

Usage: python scripts/cli_latency.py [--frames 20] [--render] [--split]
Prints p50/p90 per-frame ms through the full Python API (preprocess +
device round trips + unmapping + optional host render).

--split additionally decomposes the latency into tunnel RTT / upload /
on-device compute / host post-processing (VERDICT r2 item 8): on this box
the TPU sits behind the remote "axon" tunnel, so every dispatch+fetch pays
a network round trip the published e2e number includes; the serving floor
on a locally attached chip is ~ (device + host) only.
"""
import argparse
import json
import time

import numpy as np


def measure_split(model, frame, iters=20):
    import jax
    import jax.numpy as jnp

    # 1. bare tunnel RTT: trivial dispatch + 4-byte fetch
    one = jax.device_put(np.float32(1.0))
    tiny = jax.jit(lambda a: a + 1.0)
    float(tiny(one))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(tiny(one))
    rtt = (time.perf_counter() - t0) / iters * 1e3

    # 2. upload cost of the preprocessed frame
    from romp_tpu.utils.io import img_preprocess

    inp, meta = img_preprocess(frame)
    t0 = time.perf_counter()
    for _ in range(iters):
        dev = jax.device_put(inp)
        float(jnp.sum(dev[0, 0, 0]))          # settle the transfer
    upload = (time.perf_counter() - t0) / iters * 1e3 - rtt

    # 3. device dispatch+compute: the jitted pipeline with a 4-byte
    # checksum fetch as barrier (minus RTT and upload, which it includes)
    img_u8 = np.clip(inp, 0, 255).astype(np.uint8)
    out = model.pipeline(img_u8)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = model.pipeline(img_u8)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    dev_ms = (time.perf_counter() - t0) / iters * 1e3 - rtt - upload
    return rtt, max(upload, 0.0), max(dev_ms, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--split", action="store_true")
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

    rec = {
        "p50_ms": round(float(np.percentile(ts, 50)), 1),
        "p90_ms": round(float(np.percentile(ts, 90)), 1),
        "fps": round(1e3 / float(np.percentile(ts, 50)), 1),
        "render": args.render,
        "device": str(jax.devices()[0])}
    if args.split:
        rtt, upload, dev_ms = measure_split(model, frame, args.frames)
        rec["tunnel_rtt_ms"] = round(rtt, 1)
        rec["upload_ms"] = round(upload, 1)
        if dev_ms is not None:
            rec["device_ms"] = round(dev_ms, 1)
            host = rec["p50_ms"] - rtt - upload - dev_ms
            rec["host_ms"] = round(max(host, 0.0), 1)
            # serving floor on a locally attached chip (no tunnel)
            rec["local_attach_p50_est_ms"] = round(
                max(dev_ms, 0.0) + max(host, 0.0) + upload, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
