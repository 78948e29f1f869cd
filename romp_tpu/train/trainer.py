"""Training driver: epoch loop, SPMD step, validation-gated checkpointing.

Reference behavior mirrored (`romp/train.py:7-150`, `romp/base.py:29-193`):
- NaN-loss steps are skipped (train.py:45-46)
- validation every `test_interval` steps; best-val checkpoint kept
  (validation-driven regression detection, train.py:115-150)
- per-epoch checkpoints; moving-average loss logging

TPU redesign: one jitted SPMD train step over a data-parallel mesh replaces
DP/DDP/SyncBN/balanced-DP; checkpoints are flat .npz archives of params +
optimizer state (loadable without torch/orbax).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from romp_tpu.config import Config
from romp_tpu.models.romp import init_romp_params
from romp_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from romp_tpu.smpl.body_model import SmplModel
from romp_tpu.train.train_step import (
    TrainConfig, TrainState, init_train_state, train_step,
)


def save_train_state(path: str, state: TrainState) -> None:
    flat = {}
    for k, v in state.trainable.items():
        flat[f"p::{k}"] = np.asarray(v)
    for k, v in state.bn_state.items():
        flat[f"b::{k}"] = np.asarray(v)
    leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
    for i, leaf in enumerate(leaves):
        flat[f"o::{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(state.step)
    np.savez(path, **flat)


def load_train_state(path: str, template: TrainState) -> TrainState:
    data = np.load(path)
    trainable = {k[3:]: jnp.asarray(data[k]) for k in data.files
                 if k.startswith("p::")}
    bn_state = {k[3:]: jnp.asarray(data[k]) for k in data.files
                if k.startswith("b::")}
    leaves, treedef = jax.tree_util.tree_flatten(template.opt_state)
    opt_leaves = [jnp.asarray(data[f"o::{i}"]) for i in range(len(leaves))]
    opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    return TrainState(trainable, bn_state, opt_state,
                      jnp.asarray(data["step"]))


class Trainer:
    """Composable trainer: bring your own batch iterator (dicts matching
    `compute_losses`' batch schema; see train_step.py)."""

    def __init__(self, cfg: Config, smpl: SmplModel,
                 params: Optional[Dict] = None,
                 eval_fn: Optional[Callable[[TrainState], Dict[str, float]]]
                 = None):
        self.cfg = cfg
        self.smpl = smpl
        self.eval_fn = eval_fn
        if cfg.mesh.multihost:
            from romp_tpu.parallel.mesh import (
                initialize_distributed, make_global_mesh,
            )

            initialize_distributed(cfg.mesh.coordinator,
                                   cfg.mesh.num_processes,
                                   cfg.mesh.process_id)
            self.mesh = make_global_mesh((cfg.mesh.data_axis,))
        else:
            self.mesh = make_mesh(cfg.mesh.n_devices, (cfg.mesh.data_axis,))

        self.tcfg = TrainConfig(
            lr=cfg.train.lr,
            lr_milestones=tuple(cfg.train.lr_milestones),
            lr_decay=cfg.train.lr_decay,
            warmup_steps=cfg.train.warmup_steps,
            weight_decay=cfg.train.weight_decay,
            grad_clip=cfg.train.grad_clip,
            centermap_weight=cfg.loss.centermap_weight,
            kp2d_weight=cfg.loss.kp2d_weight,
            mpjpe_weight=cfg.loss.mpjpe_weight,
            pampjpe_weight=cfg.loss.pampjpe_weight,
            pose_weight=cfg.loss.pose_weight,
            shape_weight=cfg.loss.shape_weight,
            prior_weight=cfg.loss.prior_weight,
            loss_thresh=cfg.loss.loss_thresh,
            compute_dtype=cfg.train.compute_dtype,
            act_dtype=cfg.train.act_dtype,
            remat=cfg.train.remat,
            cam_scale_base=cfg.model.cam_scale_base,
            backbone=cfg.model.backbone,
        )
        # GMM pose prior: load the packed reference asset (gmm_08.pkl /
        # .npz via GmmPrior.load) when configured; otherwise a synthetic
        # moment-matched GMM keeps the term active (calc_loss.py:151-155).
        from romp_tpu.train.priors import GmmPrior

        if self.tcfg.prior_weight > 0:
            path = cfg.loss.prior_path
            self.prior = GmmPrior.load(path) if path else GmmPrior.synthetic()
        else:
            self.prior = None
        if params is None:
            params = init_romp_params(
                jax.random.PRNGKey(cfg.train.seed),
                input_size=cfg.model.input_size,
                backbone=cfg.model.backbone)
        state = init_train_state(params, self.tcfg)
        if cfg.train.resume:
            if cfg.train.fine_tune:
                # fine-tune semantics (reference --fine_tune +
                # copy_state_dict, `romp/lib/utils/train_utils.py:15-66`):
                # take weights + BN stats from the checkpoint, start a
                # FRESH optimizer/step (so the LR schedule restarts).
                loaded = load_train_state(cfg.train.resume, state)
                state = init_train_state(
                    {**loaded.trainable, **loaded.bn_state}, self.tcfg)
            else:
                # full resume: params + BN + optimizer state + step counter
                state = load_train_state(cfg.train.resume, state)
        self.state = replicate_tree(state, self.mesh)
        self._step = jax.jit(
            lambda s, b: train_step(s, b, self.smpl, self.tcfg, self.prior),
            donate_argnums=(0,))
        # Pipelined variant: metrics leave the step as ONE packed f32 vector
        # so the host pays a single fetch (each device->host fetch is a full
        # network round trip on a remote-tunneled TPU; a dict of ~15 scalars
        # fetched one float() at a time serializes ~15 RTTs per step).
        self._metric_names = None

        def _step_packed(s, b):
            s2, m = train_step(s, b, self.smpl, self.tcfg, self.prior)
            names = tuple(sorted(m))
            return s2, jnp.stack([m[k].astype(jnp.float32) for k in names])

        self._step_packed = jax.jit(_step_packed, donate_argnums=(0,))
        self.best_val = float("inf")
        # rank-0-only logging/checkpointing in multi-host jobs (the
        # reference's rank gate, `romp/base.py:184-186`)
        self._is_main = jax.process_index() == 0
        os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
        self._log_path = osp.join(cfg.train.checkpoint_dir, "train_log.jsonl")
        # TensorBoard curves alongside the jsonl (`romp/train.py:65-78`)
        if cfg.train.tensorboard:
            from romp_tpu.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(osp.join(cfg.train.checkpoint_dir, "tb"))
        else:
            self.tb = None

    def _log(self, record: Dict) -> None:
        if not self._is_main:
            return
        with open(self._log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tb is not None and "step" in record:
            scalars = {k: v for k, v in record.items()
                       if isinstance(v, (int, float)) and k != "step"}
            flat_val = {f"val/{k}": v
                        for k, v in record.get("val", {}).items()
                        if isinstance(v, (int, float))}
            if scalars or flat_val:
                self.tb.add_scalars({**scalars, **flat_val},
                                    int(record["step"]))

    def _save_snapshot(self, step: int) -> None:
        """Rotating step snapshots every test_interval (the reference saves
        via save_model each interval, `romp/lib/utils/train_utils.py:68`);
        the newest `train.keep_checkpoints` are kept."""
        keep = self.cfg.train.keep_checkpoints
        if keep <= 0 or not self._is_main:
            return
        ckdir = self.cfg.train.checkpoint_dir
        save_train_state(osp.join(ckdir, f"step_{step:08d}.npz"), self.state)
        snaps = sorted(f for f in os.listdir(ckdir)
                       if f.startswith("step_") and f.endswith(".npz"))
        for old in snaps[:-keep]:
            os.remove(osp.join(ckdir, old))

    def log_image_grid(self, tag: str, images, step: int) -> None:
        """Best/worst sample grids (`romp/train.py:69-78` equivalent) —
        callers pass uint8 (N, H, W, 3) RGB renders."""
        if self.tb is not None:
            self.tb.add_image_grid(tag, np.asarray(images), step)

    def fit(self, batches: Iterator[Dict], max_steps: Optional[int] = None
            ) -> Dict[str, float]:
        """Pipelined train loop: the device computes step k while the host
        uploads batch k+1 and consumes step k-1's metrics.

        Dispatching a step is async under jit; only the metrics fetch
        blocks. By consuming metrics ONE STEP LATE, the fetch lands after
        the next step has already been enqueued, so the device never idles
        waiting on host logging (on a remote-tunneled TPU the old
        fetch-every-scalar loop cost ~15 RTTs of dead time per step).
        Correctness is unchanged: non-finite updates are rejected ON DEVICE
        (optax.apply_if_finite, the reference's NaN skip
        `romp/train.py:45-46`); the host merely logs them a step later.
        """
        cfg = self.cfg.train
        running: Dict[str, float] = {}
        n_skipped = 0
        t0 = time.time()
        last_metrics: Dict[str, float] = {}
        step0: Optional[int] = None
        n_done = 0

        def consume(packed, step: int) -> None:
            nonlocal n_skipped, last_metrics
            vals = np.asarray(packed)          # ONE fetch for all metrics
            m = dict(zip(self._metric_names, vals.tolist()))
            if (not np.isfinite(m["total"])
                    or m.get("grads_finite", 1.0) < 0.5):
                n_skipped += 1
                self._log({"step": step, "event": "nan_skip"})
                return
            last_metrics = m
            for k, v in m.items():
                running[k] = 0.9 * running.get(k, v) + 0.1 * v
            if step % cfg.log_every == 0:
                rate = n_done / (time.time() - t0)
                self._log({"step": step, "loss": running.get("total"),
                           "steps_per_sec": round(rate, 3), **running})
            if cfg.test_interval and step % cfg.test_interval == 0 \
                    and self.eval_fn is not None:
                val = self.eval_fn(self.state)
                self._log({"step": step, "val": val})
                key = val.get("pampjpe", val.get("total", 0.0))
                if key < self.best_val:
                    self.best_val = key
                    if self._is_main:
                        save_train_state(
                            osp.join(cfg.checkpoint_dir, "best.npz"),
                            self.state)

        pending = None                          # (packed_metrics, step)
        for i, batch in enumerate(batches):
            if max_steps is not None and i >= max_steps:
                break
            if step0 is None:
                # one-time: metric names from an abstract trace (no compile,
                # no device work) + the starting step counter (host mirror:
                # state.step increments unconditionally every step).
                step0 = int(self.state.step)
                if self._metric_names is None:
                    _, mshape = jax.eval_shape(
                        lambda s, b: train_step(s, b, self.smpl, self.tcfg,
                                                self.prior),
                        self.state, batch)
                    self._metric_names = tuple(sorted(mshape))
            if self.cfg.mesh.multihost:
                from romp_tpu.parallel.mesh import shard_batch_global

                batch = shard_batch_global(batch, self.mesh,
                                           self.cfg.mesh.data_axis)
            else:
                batch = shard_batch(batch, self.mesh,
                                    self.cfg.mesh.data_axis)
            new_state, packed = self._step_packed(self.state, batch)
            self.state = new_state
            n_done += 1
            step = step0 + n_done
            if pending is not None:
                consume(*pending)
                pending = None
            if cfg.test_interval and step % cfg.test_interval == 0:
                # checkpoint/eval-due step: synchronize NOW so eval_fn and
                # the snapshot see the state exactly at `step` (pipelining
                # would hand them a state one step newer).
                consume(packed, step)
                self._save_snapshot(step)
            else:
                pending = (packed, step)
        if pending is not None:
            consume(*pending)

        if self._is_main:
            save_train_state(osp.join(cfg.checkpoint_dir, "last.npz"),
                             self.state)
        last_metrics["skipped"] = n_skipped
        return last_metrics
