"""Tests: LR schedule, 2D-pose pretraining driver, TRACE training launcher."""
import json
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_make_lr_schedule_multistep_and_warmup():
    from romp_tpu.train.train_step import make_lr_schedule

    # plain float when no schedule requested
    assert make_lr_schedule(3e-4) == 3e-4

    sched = make_lr_schedule(1.0, milestones=(10, 20), decay=0.1)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(19)) == pytest.approx(0.1)
    assert float(sched(20)) == pytest.approx(0.01)

    warm = make_lr_schedule(1.0, warmup_steps=4)
    assert float(warm(0)) == pytest.approx(0.25)
    assert float(warm(3)) == pytest.approx(1.0)
    assert float(warm(100)) == pytest.approx(1.0)

    both = make_lr_schedule(1.0, milestones=(8,), decay=0.5, warmup_steps=2)
    assert float(both(0)) == pytest.approx(0.5)
    assert float(both(8)) == pytest.approx(0.5)


def test_lr_schedule_in_optimizer_changes_step_size():
    """The scheduled optimizer must actually shrink updates after the
    milestone (wires optax.adamw(schedule) correctly)."""
    import optax

    from romp_tpu.train.train_step import make_lr_schedule

    lr = make_lr_schedule(0.1, milestones=(2,), decay=0.01)
    opt = optax.adamw(lr)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}
    sizes = []
    for _ in range(4):
        updates, state = opt.update(g, state, params)
        sizes.append(float(jnp.abs(updates["w"]).max()))
    assert sizes[1] == pytest.approx(sizes[0], rel=0.2)
    assert sizes[2] < sizes[0] * 0.05  # decayed by 0.01


def test_pretrain_forward_shapes():
    from romp_tpu.models.layers import ParamStore
    from romp_tpu.train.pretrain import (
        PretrainConfig, init_pretrain_params, pretrain_forward,
    )

    cfg = PretrainConfig(num_joints=54)
    params = init_pretrain_params(jax.random.PRNGKey(0), cfg, input_size=64)
    assert any(k.startswith("pretrain_head.") for k in params)
    assert any(k.startswith("backbone.") for k in params)
    heat, tags, center = pretrain_forward(
        ParamStore(params), jnp.zeros((2, 64, 64, 3)), cfg)
    assert heat.shape == (2, 8, 8, 54)
    assert tags.shape == (2, 8, 8, 54)
    assert center.shape == (2, 8, 8, 1)


@pytest.mark.slow
def test_pretrain_descends():
    from romp_tpu.train.pretrain import (
        PretrainConfig, init_pretrain_params, init_pretrain_state,
        make_synthetic_pretrain_batch, pretrain_step,
    )

    cfg = PretrainConfig()
    params = init_pretrain_params(jax.random.PRNGKey(0), cfg, input_size=64)
    state = init_pretrain_state(params, cfg)
    step = jax.jit(lambda s, b: pretrain_step(s, b, cfg),
                   donate_argnums=(0,))
    batch = make_synthetic_pretrain_batch(jax.random.PRNGKey(1), 4,
                                          input_size=64)
    hist = []
    for _ in range(8):
        state, metrics = step(state, batch)
        hist.append(float(metrics["total"]))
        assert float(metrics["grads_finite"]) == 1.0
    assert np.isfinite(hist).all()
    # repeated same-batch steps must reduce the loss
    assert min(hist[4:]) < hist[0]


def _write_video_pack(tmp_path, n_frames=6, size=64):
    import cv2

    from romp_tpu.train.data.video_dataset import (
        VideoSequence, save_video_pack,
    )

    paths = []
    for t in range(n_frames):
        p = str(tmp_path / f"fr{t}.png")
        cv2.imwrite(p, np.full((size, size, 3), 100 + 10 * t, np.uint8))
        paths.append(p)
    F = n_frames
    subj = {
        "valid": np.ones(F, bool),
        "czyx": np.stack([np.full(F, 3), np.arange(F) % (size // 4),
                          np.arange(F) % (size // 4)], -1).astype(np.int32),
        "trans3d": np.tile(np.array([0.1, 0.2, 3.0], np.float32), (F, 1)),
        "world_trans": np.tile(np.array([0.1, 0.2, 3.0], np.float32),
                               (F, 1)),
        "world_grot": np.zeros((F, 3), np.float32),
        "pose": np.zeros((F, 66), np.float32),
        "betas": np.zeros((F, 11), np.float32),
    }
    seqs = [VideoSequence(frame_paths=paths, subjects={0: subj},
                          is_static_cam=True)]
    pack = tmp_path / "dynacam.npz"
    save_video_pack(str(pack), seqs)
    return pack


def test_video_pack_roundtrip(tmp_path):
    from romp_tpu.train.data.video_dataset import load_video_pack

    _write_video_pack(tmp_path)
    seqs = load_video_pack(str(tmp_path / "dynacam.npz"))
    assert len(seqs) == 1
    assert seqs[0].num_frames == 6
    assert 0 in seqs[0].subjects
    np.testing.assert_array_equal(seqs[0].subjects[0]["valid"],
                                  np.ones(6, bool))
    assert seqs[0].subjects[0]["pose"].shape == (6, 66)
    assert seqs[0].is_static_cam


@pytest.mark.slow
def test_trace_launcher_smoke(tmp_path):
    """`python -m romp_tpu.train.launch --config configs/trace.yml` end to
    end on CPU with tiny shapes (VERDICT r2 item 7)."""
    from romp_tpu.train.launch import main

    _write_video_pack(tmp_path)
    ckpt = tmp_path / "ckpt"
    rc = main(["--config", "configs/trace.yml",
               "--data_root", str(tmp_path), "--max_steps", "2",
               "model.input_size=64",
               "trace.clip_length=2",
               "trace.dynamic_aug_prob=0.0",
               "trace.use_optical_flow=False",
               "train.batch_size=2",
               "train.compute_dtype=float32",
               "train.log_every=1",
               f"train.checkpoint_dir={ckpt}",
               "mesh.n_devices=2",
               f"data.datasets=dynacam"])
    assert rc == 0
    assert osp.exists(ckpt / "trace_last.npz")
    log = [json.loads(l) for l in
           open(ckpt / "trace_train_log.jsonl").read().splitlines()]
    assert log and np.isfinite([r["total"] for r in log]).all()


@pytest.mark.slow
def test_pretrain_launcher_smoke(tmp_path):
    """Pretrain launcher consumes the same annotation packs as the trainer
    (VERDICT r2 item 5)."""
    import cv2

    from romp_tpu.train.data.dataset import ImageAnnotation, save_pack
    from romp_tpu.train.pretrain import main

    img_path = str(tmp_path / "im.png")
    cv2.imwrite(img_path, np.full((80, 80, 3), 90, np.uint8))
    rng = np.random.RandomState(0)
    recs = []
    for i in range(4):
        kp = (rng.rand(1, 54, 2) * 60 + 10).astype(np.float32)
        recs.append(ImageAnnotation(
            image_path=img_path,
            kp2ds=kp,
            bboxes=np.array([[10, 10, 60, 60]], np.float32)))
    save_pack(str(tmp_path / "coco.npz"), recs)

    ckpt = tmp_path / "ckpt"
    rc = main(["--data_root", str(tmp_path), "--max_steps", "2",
               "model.input_size=64",
               "train.batch_size=2", "train.compute_dtype=float32",
               "train.log_every=1",
               f"train.checkpoint_dir={ckpt}",
               "mesh.n_devices=2",
               "data.datasets=coco"])
    assert rc == 0
    assert osp.exists(ckpt / "pretrain_last.npz")
    log = [json.loads(l) for l in
           open(ckpt / "pretrain_log.jsonl").read().splitlines()]
    assert log and np.isfinite([r["total"] for r in log]).all()
