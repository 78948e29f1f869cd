"""TRACE pipeline integration tests: tracking logic + end-to-end smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.pipeline.trace_tracking import (
    Memory5D, SeqConfig, assemble_trajectories, gate_features_with_memory,
    infill_and_smooth_cams, trace_cam_to_trans,
)


def _dets_for_two_people(T, jitter=0.0, drop=()):
    rng = np.random.RandomState(0)
    base = [np.array([0.8, 0.1, 0.1]), np.array([0.5, -0.4, 0.5])]
    czyxs, scores, cams, motions = [], [], [], []
    for f in range(T):
        fc, fs, fz, fm = [], [], [], []
        for p, b in enumerate(base):
            if (f, p) in drop:
                continue
            cam = b + rng.randn(3) * jitter
            fz.append([10 + p, 40 + p * 30 + f, 60 + p * 10])
            fs.append(0.9)
            fc.append(cam)
            fm.append(np.zeros(3))
        czyxs.append(np.asarray(fz, np.int32).reshape(-1, 3))
        scores.append(np.asarray(fs, np.float32))
        cams.append(np.asarray(fc, np.float32).reshape(-1, 3))
        motions.append(np.asarray(fm, np.float32).reshape(-1, 3))
    return czyxs, scores, cams, motions


def test_assemble_trajectories_two_stable_tracks():
    cfg = SeqConfig(subject_num=-1)
    T = 8
    traj, tracker = assemble_trajectories(
        *_dets_for_two_people(T, jitter=0.005), cfg)
    assert traj is not None
    assert len(traj.track_ids) == 2
    assert traj.frame_valid.all()
    # continuing the same tracker across a second clip keeps identities
    traj2, _ = assemble_trajectories(
        *_dets_for_two_people(T, jitter=0.005), cfg, tracker)
    assert set(traj2.track_ids) == set(traj.track_ids)


def test_trajectory_infilling_on_missed_frames():
    cfg = SeqConfig(subject_num=-1)
    T = 8
    traj, _ = assemble_trajectories(
        *_dets_for_two_people(T, drop=[(3, 0), (4, 0)]), cfg)
    tid0_row = 0 if traj.frame_valid[0].sum() == 6 else 1
    assert traj.frame_valid[tid0_row].sum() == 6
    assert not traj.frame_valid[tid0_row][3]

    # feature gating: missed frames inherit memory
    mem = Memory5D()
    feats = np.random.RandomState(1).randn(2, T, 8).astype(np.float32)
    gated = gate_features_with_memory(traj, feats, mem, cfg)
    assert traj.inherent_flags[tid0_row][3]
    np.testing.assert_array_equal(gated[tid0_row, 3], gated[tid0_row, 2])

    # cam infilling interpolates the two missing frames
    cams = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (2, T, 1))
    cams[tid0_row, 2] = [1.0, 0.0, 0.0]
    cams[tid0_row, 5] = [1.0, 0.3, 0.3]
    cfg_nosmooth = SeqConfig(smooth_pos_cam=False)
    filled = infill_and_smooth_cams(traj, cams.copy(), Memory5D(),
                                    cfg_nosmooth)
    np.testing.assert_allclose(filled[tid0_row, 3],
                               cams[tid0_row, 2] * 2 / 3
                               + cams[tid0_row, 5] / 3, atol=1e-5)


def test_subject_num_locks_first_frame_subjects():
    cfg = SeqConfig(subject_num=1, accept_new_dets=False)
    traj, _ = assemble_trajectories(*_dets_for_two_people(8), cfg)
    assert len(traj.track_ids) == 1


def test_trace_cam_to_trans_depth_positive():
    cams = np.array([[1.0, 0.2, -0.3], [0.2, 0.0, 0.0]], np.float32)
    t = trace_cam_to_trans(cams)
    assert (t[:, 2] > 0).all()
    assert t[0, 2] < t[1, 2]  # larger scale -> nearer


@pytest.mark.slow
def test_trace_pipeline_end_to_end_smoke():
    from romp_tpu.models.hrnet import hrnet_w32  # noqa: F401
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.models.romp import init_romp_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    params = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    # add the image backbone (HRNet) under the same flat dict
    backbone = init_romp_params(jax.random.PRNGKey(1))
    params.update({k: v for k, v in backbone.items()
                   if k.startswith("backbone.")})

    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = TraceConfig(temp_clip_length=2, max_person=4, conf_thresh=-1e9)
    seq_cfg_kwargs = dict(large_object_thresh=-1e9,
                          first_frame_det_thresh=-1e9,
                          tracker_det_thresh=-1e9,
                          tracker_match_thresh=1e9)
    from romp_tpu.pipeline.trace_tracking import SeqConfig as SC

    pipe = TracePipeline(params, adult, baby, cfg, SC(**seq_cfg_kwargs))

    rng = np.random.RandomState(0)
    frames = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0
    out1 = pipe.process_clip(frames)
    assert out1 is not None
    N1 = len(set(out1["track_ids"]))
    assert N1 >= 1
    assert out1["verts"].shape[-2:] == (6890, 3)
    assert np.isfinite(out1["world_cams"]).all()
    assert np.isfinite(out1["pj2d"]).all()

    # second clip: carried state (hidden/tracker/memory) must persist
    out2 = pipe.process_clip(frames)
    assert out2 is not None
    assert set(out2["track_ids"]) & set(out1["track_ids"])

    # pipelined stream must be bit-identical to sequential processing:
    # dispatch_clip only consumes device-side recurrent state, collect_clip
    # host state in clip order, so overlap cannot change results
    pipe2 = TracePipeline(params, adult, baby, cfg, SC(**seq_cfg_kwargs))
    souts = list(pipe2.process_stream([frames, frames]))
    assert len(souts) == 2
    for ref, got in ((out1, souts[0]), (out2, souts[1])):
        assert got is not None
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)

    # batched frontend (backbone over both clips in one call) must also be
    # bit-identical: the backbone is per-frame, so concatenation cannot
    # change its math, and the GRU maps stage still runs per clip in order
    pipe3 = TracePipeline(params, adult, baby, cfg, SC(**seq_cfg_kwargs))
    bouts = list(pipe3.process_stream([frames, frames], frontend_batch=2))
    assert len(bouts) == 2
    for ref, got in ((out1, bouts[0]), (out2, bouts[1])):
        assert got is not None
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)


def test_dispatch_clips_flow_pairing_bitexact(monkeypatch):
    """dispatch_clips with a flow_fn builds the concatenated pair list
    (prev_last, A0), (A0, A1), ..., (A_last, B0), ... — exactly what the
    per-clip calls produce. Uses a cheap stand-in backbone so the test
    exercises the pairing/split logic, not HRNet."""
    import romp_tpu.pipeline.trace_pipeline as tp
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.pipeline.trace_tracking import SeqConfig as SC
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    @jax.jit
    def fake_feats(frames):
        x = jax.image.resize(frames.astype(jnp.float32) / 255.0,
                             (frames.shape[0], 128, 128, 3), "bilinear")
        return jnp.tile(x, (1, 1, 1, 11))[..., :32]

    monkeypatch.setattr(tp, "trace_extract_features",
                        lambda p, f, u, c: fake_feats(f))

    @jax.jit
    def flow_fn(prev, cur):
        d = jax.image.resize((cur - prev).astype(jnp.float32),
                             (cur.shape[0], tp.OUTMAP, tp.OUTMAP, 3),
                             "bilinear")
        return d[..., :2] * 0.01

    params = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = TraceConfig(temp_clip_length=2, max_person=4, conf_thresh=-1e9)
    kw = dict(large_object_thresh=-1e9, first_frame_det_thresh=-1e9,
              tracker_det_thresh=-1e9, tracker_match_thresh=1e9)

    rng = np.random.RandomState(3)
    f1 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0
    f2 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0

    pa = TracePipeline(params, adult, baby, cfg, SC(**kw), flow_fn=flow_fn)
    ref = [pa.process_clip(f1), pa.process_clip(f2)]
    pb = TracePipeline(params, adult, baby, cfg, SC(**kw), flow_fn=flow_fn)
    got = [pb.collect_clip(h) for h in pb.dispatch_clips([f1, f2])]
    for r, g in zip(ref, got):
        assert r is not None and g is not None
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k)


def test_dispatch_sequence_flow_convention(monkeypatch):
    """A flow_fn marked takes_sequence gets the (T+1)-frame stack
    [prev_last, f0..fT-1] and must yield the same pipeline outputs as the
    pairwise convention computing the same flows."""
    import romp_tpu.pipeline.trace_pipeline as tp
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.pipeline.trace_tracking import SeqConfig as SC
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    @jax.jit
    def fake_feats(frames):
        x = jax.image.resize(frames.astype(jnp.float32) / 255.0,
                             (frames.shape[0], 128, 128, 3), "bilinear")
        return jnp.tile(x, (1, 1, 1, 11))[..., :32]

    monkeypatch.setattr(tp, "trace_extract_features",
                        lambda p, f, u, c: fake_feats(f))

    @jax.jit
    def pair_flow(prev, cur):
        d = jax.image.resize((cur - prev).astype(jnp.float32),
                             (cur.shape[0], tp.OUTMAP, tp.OUTMAP, 3),
                             "bilinear")
        return d[..., :2] * 0.01

    def seq_flow(frames_seq):
        return pair_flow(frames_seq[:-1], frames_seq[1:])

    seq_flow.takes_sequence = True

    params = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    cfg = TraceConfig(temp_clip_length=2, max_person=4, conf_thresh=-1e9)
    kw = dict(large_object_thresh=-1e9, first_frame_det_thresh=-1e9,
              tracker_det_thresh=-1e9, tracker_match_thresh=1e9)

    rng = np.random.RandomState(4)
    f1 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0
    f2 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0

    pa = TracePipeline(params, adult, baby, cfg, SC(**kw),
                       flow_fn=pair_flow)
    ref = [pa.process_clip(f1), pa.process_clip(f2)]
    pb = TracePipeline(params, adult, baby, cfg, SC(**kw),
                       flow_fn=seq_flow)
    got = [pb.process_clip(f1), pb.process_clip(f2)]
    for r, g in zip(ref, got):
        assert r is not None and g is not None
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k)
    # batched dispatch uses the sequence convention too
    pc = TracePipeline(params, adult, baby, cfg, SC(**kw),
                       flow_fn=seq_flow)
    got2 = [pc.collect_clip(h) for h in pc.dispatch_clips([f1, f2])]
    for r, g in zip(ref, got2):
        assert g is not None
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k)


@pytest.mark.slow
def test_fused_frontend_matches_unfused(monkeypatch):
    """cfg.fused_frontend=True (the TPU default: whole frontend in ONE
    jitted call) must produce outputs bit-identical to the per-stage
    path, across clips (carried hidden/feature/frame state included)."""
    import romp_tpu.pipeline.trace_pipeline as tp
    from romp_tpu.models.trace import init_trace_params
    from romp_tpu.pipeline.trace_pipeline import TraceConfig, TracePipeline
    from romp_tpu.pipeline.trace_tracking import SeqConfig as SC
    from romp_tpu.smpl.assets import synthetic_assets
    from romp_tpu.smpl.body_model import SmplModel

    def fake_backbone(store, x, prefix="backbone"):
        y = jax.image.resize(x, (x.shape[0], 128, 128, 3), "bilinear")
        return jnp.tile(y, (1, 1, 1, 11))[..., :32]

    monkeypatch.setattr(tp, "hrnet_w32", fake_backbone)
    monkeypatch.setattr(
        tp, "trace_extract_features",
        jax.jit(lambda p, f, u, c: fake_backbone(
            None, (f.astype(jnp.float32) / 255.0) * 2.0 - 1.0),
            static_argnums=(3,)))

    params = init_trace_params(jax.random.PRNGKey(0), clip_length=2)
    adult = SmplModel.from_assets(synthetic_assets(seed=0, num_betas=11))
    baby = SmplModel.from_assets(synthetic_assets(seed=1, num_betas=10))
    kw = dict(large_object_thresh=-1e9, first_frame_det_thresh=-1e9,
              tracker_det_thresh=-1e9, tracker_match_thresh=1e9)
    rng = np.random.RandomState(5)
    f1 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0
    f2 = rng.rand(2, 512, 512, 3).astype(np.float32) * 255.0

    cfg_a = TraceConfig(temp_clip_length=2, max_person=4, conf_thresh=-1e9,
                        fused_frontend=False)
    pa = TracePipeline(params, adult, baby, cfg_a, SC(**kw))
    assert pa._fused is False
    ref = [pa.process_clip(f1), pa.process_clip(f2)]

    cfg_b = TraceConfig(temp_clip_length=2, max_person=4, conf_thresh=-1e9,
                        fused_frontend=True)
    pb = TracePipeline(params, adult, baby, cfg_b, SC(**kw))
    assert pb._fused is True
    got = [pb.process_clip(f1), pb.process_clip(f2)]

    for r, g in zip(ref, got):
        assert r is not None and g is not None
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k)

    # stream mode on the fused path: same results, one-clip-late finalize
    pc = TracePipeline(params, adult, baby, cfg_b, SC(**kw))
    souts = list(pc.process_stream([f1, f2]))
    for r, g in zip(ref, souts):
        assert g is not None
        for k in r:
            np.testing.assert_array_equal(
                np.asarray(r[k]), np.asarray(g[k]), err_msg=k)
