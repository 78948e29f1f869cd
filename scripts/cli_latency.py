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

    med = lambda ts: float(np.median(ts)) * 1e3

    # 1. bare tunnel RTT: trivial dispatch + 4-byte fetch
    one = jax.device_put(np.float32(1.0))
    tiny = jax.jit(lambda a: a + 1.0)
    float(tiny(one))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(tiny(one))
        ts.append(time.perf_counter() - t0)
    rtt = med(ts)

    # 2. device-only compute: the jitted pipeline on a PRE-UPLOADED frame,
    # 4-byte checksum fetch as barrier -> loop = device + one RTT
    from romp_tpu.utils.io import img_preprocess

    inp, meta = img_preprocess(frame)
    img_u8 = np.clip(inp, 0, 255).astype(np.uint8)
    chk = jax.jit(lambda o: sum(
        jnp.sum(v.astype(jnp.float32)) for v in
        jax.tree_util.tree_leaves(o)))
    img_dev = jax.device_put(img_u8)
    float(chk(model.pipeline(img_dev)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chk(model.pipeline(img_dev)))
        ts.append(time.perf_counter() - t0)
    dev_ms = med(ts) - rtt

    # 3. upload: same loop with the host array (re-uploaded each call)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chk(model.pipeline(img_u8)))
        ts.append(time.perf_counter() - t0)
    upload = med(ts) - rtt - dev_ms

    # 4. result download: full device_get of the output dict (the big
    # verts/joints tensors; scales with the slot count — see --fetch_person)
    jax.device_get(model.pipeline(img_dev))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(model.pipeline(img_dev))
        ts.append(time.perf_counter() - t0)
    fetch = med(ts) - rtt - dev_ms
    return rtt, max(upload, 0.0), max(dev_ms, 0.0), max(fetch, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--fetch_person", type=int, default=0,
                    help="top-N slot compaction before the result fetch")
    args = ap.parse_args()

    from romp_tpu.cli.romp import ROMP, romp_settings

    settings = romp_settings(
        ["-m", "webcam", "-o", "/tmp/cli_latency_out",
         "--fetch_person", str(args.fetch_person)]
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
        rtt, upload, dev_ms, fetch = measure_split(model, frame, args.frames)
        rec["fetch_person"] = args.fetch_person
        rec["tunnel_rtt_ms"] = round(rtt, 1)
        rec["upload_ms"] = round(upload, 1)
        rec["device_ms"] = round(dev_ms, 1)
        rec["result_fetch_ms"] = round(fetch, 1)
        host = rec["p50_ms"] - rtt - upload - dev_ms - fetch
        rec["host_ms"] = round(max(host, 0.0), 1)
        # serving floor on a locally attached chip: tunnel RTT gone,
        # upload/fetch ride PCIe instead of the network (≈free at these
        # sizes), leaving device compute + host post-processing
        rec["local_attach_p50_est_ms"] = round(
            max(dev_ms, 0.0) + max(host, 0.0), 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
