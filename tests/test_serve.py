"""Serving front-end: micro-batcher semantics + TCP end-to-end."""
import threading
import time

import numpy as np
import pytest

import jax

from romp_tpu.serve import (
    InferenceClient, InferenceServer, MicroBatcher, _pad_sizes,
    make_romp_service,
)


def test_pad_sizes():
    assert _pad_sizes(8) == [1, 2, 4, 8]
    assert _pad_sizes(6) == [1, 2, 4, 6]
    assert _pad_sizes(1) == [1]


def test_microbatcher_routes_results_and_pads():
    """Results come back to the right futures; batches are padded to the
    compiled sizes; padded rows never leak into responses."""
    seen_batches = []

    def run_batch(images):
        seen_batches.append(images.shape[0])
        # "result" = per-image checksum so routing is verifiable
        return {"sum": images.reshape(images.shape[0], -1).sum(1)}

    mb = MicroBatcher(run_batch, fetch=lambda h: h, max_batch=4,
                      window_ms=30.0, input_size=8)
    try:
        imgs = [np.full((8, 8, 3), i + 1, np.uint8) for i in range(3)]
        futs = [mb.submit(im) for im in imgs]
        res = [f.result(timeout=10) for f in futs]
        for i, r in enumerate(res):
            assert r["sum"] == (i + 1) * 8 * 8 * 3
        # 3 requests within one window -> one batch, padded to 4
        assert mb.batches_run == 1 and seen_batches == [4]
        assert mb.items_run == 3
    finally:
        mb.close()


def test_precompile_touches_every_padded_size():
    sizes_seen = []

    def run_batch(images):
        sizes_seen.append(images.shape[0])
        return {"n": np.arange(images.shape[0])}

    mb = MicroBatcher(run_batch, fetch=lambda h: h, max_batch=8,
                      window_ms=1.0, input_size=4)
    try:
        mb.precompile()
        assert sizes_seen == [1, 2, 4, 8]
    finally:
        mb.close()


def test_microbatcher_exception_propagates():
    def run_batch(images):
        raise RuntimeError("boom")

    mb = MicroBatcher(run_batch, fetch=lambda h: h, max_batch=2,
                      window_ms=1.0, input_size=4)
    try:
        fut = mb.submit(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
    finally:
        mb.close()


def test_backpressure_sheds_load():
    """submit raises Overloaded once the admission queue fills."""
    from romp_tpu.serve import Overloaded

    gate = threading.Event()

    def run_batch(images):
        gate.wait(timeout=10)
        return {"n": np.arange(images.shape[0])}

    mb = MicroBatcher(run_batch, fetch=lambda h: h, max_batch=1,
                      window_ms=0.1, input_size=4, max_queue=2)
    try:
        img = np.zeros((4, 4, 3), np.uint8)
        futs = [mb.submit(img)]          # taken by the dispatcher, blocks
        time.sleep(0.2)
        futs += [mb.submit(img), mb.submit(img)]   # fills the queue (2)
        with pytest.raises(Overloaded):
            mb.submit(img)
        gate.set()
        for f in futs:
            f.result(timeout=10)
    finally:
        mb.close()


def test_close_mid_fill_still_resolves_future():
    """close() while the dispatcher is filling a batch must not strand the
    already-submitted request — it gets dispatched (or failed), never hung."""
    def run_batch(images):
        return {"n": np.arange(images.shape[0])}

    mb = MicroBatcher(run_batch, fetch=lambda h: h, max_batch=4,
                      window_ms=2000.0, input_size=4)
    fut = mb.submit(np.zeros((4, 4, 3), np.uint8))
    time.sleep(0.1)              # dispatcher is inside the fill window
    mb.close()
    assert fut.result(timeout=5) is not None


def test_microbatcher_double_buffer_overlap():
    """While batch k's fetch blocks, batch k+1 must still be dispatched
    (dispatch and collect run on separate threads)."""
    dispatched = []
    release = threading.Event()

    def run_batch(images):
        dispatched.append(time.perf_counter())
        return images.shape[0]

    def fetch(handle):
        release.wait(timeout=10)       # slow fetch (simulated RTT)
        return {"n": np.arange(handle)}

    mb = MicroBatcher(run_batch, fetch, max_batch=1, window_ms=0.1,
                      input_size=4)
    try:
        f1 = mb.submit(np.zeros((4, 4, 3), np.uint8))
        f2 = mb.submit(np.zeros((4, 4, 3), np.uint8))
        deadline = time.time() + 5
        while len(dispatched) < 2 and time.time() < deadline:
            time.sleep(0.01)
        # second batch dispatched while the first fetch is still blocked
        assert len(dispatched) == 2
        release.set()
        f1.result(timeout=10), f2.result(timeout=10)
    finally:
        mb.close()


@pytest.fixture(scope="module")
def romp_server():
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.romp_pipeline import RompConfig
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 64
    params = init_romp_params(jax.random.PRNGKey(0), input_size=size)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    cfg = RompConfig(input_size=size, max_person=4, conf_thresh=-1e9,
                     fetch_slots=2, transfer_dtype="float16")
    batcher = make_romp_service(params, smpl, cfg, max_batch=4,
                                window_ms=5.0)
    server = InferenceServer(batcher)
    yield server
    server.close()


def test_serve_end_to_end_concurrent_clients(romp_server):
    """Four concurrent clients with differently-sized images all get valid
    per-person results mapped back to their own image frames."""
    results = {}
    errors = []

    def client(i):
        try:
            c = InferenceClient(port=romp_server.port)
            rng = np.random.RandomState(i)
            img = (rng.rand(40 + 8 * i, 64, 3) * 255).astype(np.uint8)
            res = c.infer(img)
            c.close()
            results[i] = res
        except Exception as exc:  # noqa: BLE001 — surfaced via `errors`
            errors.append(exc)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert set(results) == {0, 1, 2, 3}
    for res in results.values():
        # conf_thresh=-inf -> fetch_slots=2 persons survive per image
        assert res["cam"].shape[0] == 2
        assert "pj2d_org" in res and np.isfinite(res["pj2d_org"]).all()
        assert "verts" in res and res["verts"].shape[1:] == (6890, 3)
    # micro-batching actually happened (4 clients, <=4-slot batches)
    assert romp_server.batcher.items_run >= 4
    assert romp_server.batcher.batches_run <= 4


def test_spmd_mesh_serving():
    """SPMD serving: one batcher feeds an 8-device mesh; padded batch sizes
    stay multiples of the data axis and results match single-device."""
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.parallel.mesh import make_mesh
    from romp_tpu.pipeline.romp_pipeline import RompConfig
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 64
    params = init_romp_params(jax.random.PRNGKey(0), input_size=size)
    smpl = SmplModel.from_assets(synthetic_assets(seed=0))
    cfg = RompConfig(input_size=size, max_person=4, conf_thresh=-1e9,
                     calc_smpl=False)
    mesh = make_mesh(8)
    mb = make_romp_service(params, smpl, cfg, max_batch=16, window_ms=20.0,
                           mesh=mesh)
    try:
        assert mb.sizes == [8, 16]
        rng = np.random.RandomState(0)
        imgs = [(rng.rand(size, size, 3) * 255).astype(np.uint8)
                for _ in range(3)]
        futs = [mb.submit(im) for im in imgs]
        res = [f.result(timeout=300) for f in futs]
        assert mb.batches_run == 1            # one padded-to-8 batch
        # parity vs the unsharded graph
        ref = make_romp_service(params, smpl, cfg, max_batch=4,
                                window_ms=1.0)
        try:
            for im, r in zip(imgs, res):
                r0 = ref.submit(im).result(timeout=300)
                np.testing.assert_allclose(r["center_confs"],
                                           r0["center_confs"],
                                           rtol=2e-5, atol=2e-5)
                np.testing.assert_array_equal(r["mask"], r0["mask"])
        finally:
            ref.close()
    finally:
        mb.close()


def test_bev_crowd_serving_routes_panoramas():
    """aspect>=2 images route through the sliding-window crowd pipeline;
    windows are served as ordinary micro-batched requests."""
    import argparse

    from romp_tpu.models.bev import init_bev_params
    from romp_tpu.pipeline.bev_pipeline import BevConfig
    from romp_tpu.serve import make_bev_service
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 64
    params = init_bev_params(jax.random.PRNGKey(0), input_size=size)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = BevConfig(input_size=size, max_person=4, conf_thresh=-1e9)
    batcher = make_bev_service(params, adult, baby, cfg, max_batch=4,
                               window_ms=5.0)
    crowd = argparse.Namespace(overlap_ratio=0.46, nms_thresh=20.0,
                               relative_scale_thresh=1.5, input_size=size)
    server = InferenceServer(batcher, crowd_settings=crowd)
    try:
        c = InferenceClient(port=server.port)
        rng = np.random.RandomState(0)
        pano = (rng.rand(40, 160, 3) * 255).astype(np.uint8)  # aspect 4
        res = c.infer(pano)
        c.close()
        # multiple windows went through the batcher as separate items
        assert batcher.items_run >= 2
        if res:        # random init may prune everything; shape-check if not
            assert res["cam"].ndim == 2 and res["cam"].shape[1] == 3
    finally:
        server.close()


def test_bev_service_end_to_end():
    """BEV serving: micro-batched SMPL+A graph behind the same server."""
    from romp_tpu.models.bev import init_bev_params
    from romp_tpu.pipeline.bev_pipeline import BevConfig
    from romp_tpu.serve import make_bev_service
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    size = 64
    params = init_bev_params(jax.random.PRNGKey(0), input_size=size)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = BevConfig(input_size=size, max_person=4, conf_thresh=-1e9)
    batcher = make_bev_service(params, adult, baby, cfg, max_batch=2,
                               window_ms=5.0)
    server = InferenceServer(batcher)
    try:
        c = InferenceClient(port=server.port)
        img = (np.random.RandomState(0).rand(48, 64, 3) * 255
               ).astype(np.uint8)
        res = c.infer(img)
        c.close()
        assert "verts" in res and res["verts"].shape[1:] == (6890, 3)
        assert np.isfinite(res["cam_trans"]).all()
    finally:
        server.close()


def test_stats_command(romp_server):
    c = InferenceClient(port=romp_server.port)
    img = (np.random.RandomState(1).rand(32, 48, 3) * 255).astype(np.uint8)
    c.infer(img)
    s = c.stats()
    c.close()
    assert s["items_run"] >= 1 and s["batches_run"] >= 1
    assert s["avg_batch"] >= 1.0 and s["batch_sizes"] == [1, 2, 4]


def test_serve_error_reporting(romp_server):
    """A malformed request yields an error response, not a hung socket."""
    import socket

    from romp_tpu.serve import _recv_msg, _send_msg

    sock = socket.create_connection(("127.0.0.1", romp_server.port))
    # payload size doesn't match the declared shape -> reshape error
    _send_msg(sock, {"shape": [10, 10, 3], "dtype": "uint8"}, b"\0" * 50)
    header, _ = _recv_msg(sock)
    assert header["ok"] is False and "error" in header
    sock.close()


def test_adaptive_window_grows_batches_under_overload():
    """When the device pipeline (_inflight) is full, the dispatcher keeps
    coalescing past the base window, so realized batches approach
    max_batch under saturation; a lone request still dispatches on the
    base window when the pipeline has free slots."""
    def run_batch(images):
        return images.shape[0]

    def fetch(handle):
        time.sleep(0.05)               # slow device: pipeline backs up
        return {"n": np.arange(handle)}

    mb = MicroBatcher(run_batch, fetch, max_batch=8, window_ms=1.0,
                      input_size=4)
    try:
        img = np.zeros((4, 4, 3), np.uint8)
        stop = threading.Event()
        errs = []

        def client():
            try:
                while not stop.is_set():
                    mb.submit(img).result(timeout=20)
            except Exception as e:      # pragma: no cover - debug aid
                errs.append(e)

        threads = [threading.Thread(target=client) for _ in range(16)]
        for t in threads:
            t.start()
        time.sleep(2.0)
        stop.set()
        for t in threads:
            t.join(timeout=20)
        assert not errs
        realized = mb.items_run / max(mb.batches_run, 1)
        # 16 sync clients vs a 50 ms device: without adaptation the 1 ms
        # window dispatches ~2-4 per batch; with it batches must fill
        assert realized >= 6.0, (realized, mb.batches_run, mb.items_run)
    finally:
        mb.close()

    # light load: single request resolves promptly (window not inflated)
    mb2 = MicroBatcher(run_batch, lambda h: {"n": np.arange(h)},
                       max_batch=8, window_ms=1.0, input_size=4)
    try:
        t0 = time.perf_counter()
        mb2.submit(img).result(timeout=10)
        assert time.perf_counter() - t0 < 1.0
        assert mb2.batches_run == 1 and mb2.items_run == 1
    finally:
        mb2.close()
