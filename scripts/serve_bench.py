"""Serving benchmark: offered load vs throughput/latency for romp_tpu.serve.

Spins the micro-batching InferenceServer in-process (real TCP loopback,
real protocol bytes) and drives it with N concurrent closed-loop clients,
reporting aggregate throughput + per-request latency percentiles per
concurrency level. This is the serving counterpart of scripts/cli_latency.py
(single-stream) — it shows what micro-batching buys once more than one
camera/caller hits the same chip.

Run on TPU:  python scripts/serve_bench.py [--levels 1,4,16] [--per_client 20]
CPU check:   JAX_PLATFORMS=cpu python scripts/serve_bench.py --check
"""
import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def run_level(port: int, n_clients: int, per_client: int, img_hw=(480, 640)):
    from romp_tpu.serve import InferenceClient

    lat = []
    lock = threading.Lock()
    errors = []
    barrier = threading.Barrier(n_clients + 1)

    def client(i):
        rng = np.random.RandomState(i)
        img = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
        try:
            c = InferenceClient(port=port)
            c.infer(img)                      # warm this connection
            barrier.wait()
            mine = []
            for _ in range(per_client):
                t0 = time.perf_counter()
                c.infer(img)
                mine.append(time.perf_counter() - t0)
            c.close()
            with lock:
                lat.extend(mine)
        except Exception as exc:  # noqa: BLE001 — reported below
            errors.append(exc)
            try:
                barrier.wait(timeout=1)
            except Exception:
                pass

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    lat = np.asarray(lat) * 1e3
    return {
        "clients": n_clients,
        "req_s": round(len(lat) / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p95_ms": round(float(np.percentile(lat, 95)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="tiny-model CPU smoke run")
    ap.add_argument("--levels", default="1,4,16")
    ap.add_argument("--per_client", type=int, default=20)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--window_ms", type=float, default=3.0)
    ap.add_argument("--host_note", default="",
                    help="free-text description of the host/chip setup, "
                         "stored alongside the raw jax.default_backend() id "
                         "in SERVE_BENCH.json (the 'backend' field is always "
                         "the machine-generated platform id)")
    ap.add_argument("--fetch_slots", type=int, default=8,
                    help="person slots fetched+returned per request; with "
                         "conf_thresh=-inf every slot is 'valid', so this "
                         "sets the response payload (meshes/request) — 8 is "
                         "the worst case, 2 a realistic crowd")
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")  # axon overrides the env

    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.romp_pipeline import RompConfig
    from romp_tpu.serve import InferenceServer, make_romp_service
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 64 if args.check else 512
    params = init_romp_params(jax.random.PRNGKey(0), input_size=size)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    cfg = RompConfig(input_size=size, conf_thresh=-1e9,
                     fetch_slots=args.fetch_slots,
                     compute_dtype="bfloat16", act_dtype="float32",
                     transfer_dtype="float16")
    batcher = make_romp_service(params, smpl, cfg,
                                max_batch=args.max_batch,
                                window_ms=args.window_ms)
    print(f"precompiling batch sizes {batcher.sizes} ...", flush=True)
    t0 = time.time()
    batcher.precompile()
    print(f"precompiled in {time.time() - t0:.0f}s", flush=True)
    server = InferenceServer(batcher)
    rows = []
    try:
        levels = [int(x) for x in args.levels.split(",")]
        if args.check:
            levels, args.per_client = [2], 3
        for n in levels:
            row = run_level(server.port, n, args.per_client)
            row["batches_run"] = batcher.batches_run
            rows.append(row)
            print(json.dumps(row), flush=True)
    finally:
        server.close()
    if not args.check and rows:
        out = {"backend": jax.default_backend(),
               "host_note": args.host_note,
               "max_batch": args.max_batch, "window_ms": args.window_ms,
               "fetch_slots": args.fetch_slots, "levels": rows}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SERVE_BENCH.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
