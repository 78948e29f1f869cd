"""2D-pose pretraining components: heatmaps, AE losses, peak grouping."""
import numpy as np

import jax.numpy as jnp

from romp_tpu.train.heatmap_ae import (
    ae_loss, generate_joint_heatmaps, group_by_tags, heatmap_mse_loss,
    parse_joint_heatmaps,
)


def test_joint_heatmaps_peak_positions():
    kp = jnp.zeros((1, 2, 3, 2)).at[0, 0, 0].set(jnp.asarray([0.0, 0.0]))
    kp = kp.at[0, 1, 1].set(jnp.asarray([0.5, -0.5]))
    vis = jnp.zeros((1, 2, 3), bool).at[0, 0, 0].set(True) \
        .at[0, 1, 1].set(True)
    heat = generate_joint_heatmaps(kp, vis, 64)
    assert heat.shape == (1, 64, 64, 3)
    assert float(heat[0, 32, 32, 0]) > 0.9
    assert float(heat[0, 16, 48, 1]) > 0.9
    assert float(heat[..., 2].max()) == 0.0  # invisible joint: empty


def test_heatmap_mse_ignores_empty_channels():
    gt = jnp.zeros((1, 16, 16, 2)).at[0, 8, 8, 0].set(1.0)
    pred_good = gt
    pred_bad = gt.at[..., 1].add(5.0)  # noise only on the UNSUPERVISED chan
    assert float(heatmap_mse_loss(pred_good, gt)) == 0.0
    assert float(heatmap_mse_loss(pred_bad, gt)) == 0.0
    pred_bad0 = gt.at[..., 0].add(1.0)
    assert float(heatmap_mse_loss(pred_bad0, gt)) > 0.5


def test_ae_losses_reward_separated_tags():
    B, P, J, S = 1, 2, 4, 32
    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.uniform(-0.8, 0.8, (B, P, J, 2)).astype(np.float32))
    vis = jnp.ones((B, P, J), bool)
    mask = jnp.ones((B, P), bool)

    def tags_for(v0, v1):
        t = np.zeros((B, S, S, J), np.float32)
        for p, val in enumerate((v0, v1)):
            cx = ((np.asarray(kp[0, p, :, 0]) + 1) / 2 * S).astype(int)
            cy = ((np.asarray(kp[0, p, :, 1]) + 1) / 2 * S).astype(int)
            for j in range(J):
                t[0, cy[j], cx[j], j] = val
        return jnp.asarray(t)

    pull_sep, push_sep = ae_loss(tags_for(1.0, 5.0), kp, vis, mask)
    pull_same, push_same = ae_loss(tags_for(1.0, 1.0), kp, vis, mask)
    assert float(pull_sep) < 1e-4          # consistent within person
    assert float(push_sep) < float(push_same)  # separated identities


def test_parse_and_group():
    B, S, J, P = 1, 32, 3, 2
    heat = np.zeros((B, S, S, J), np.float32)
    tags = np.zeros((B, S, S, J), np.float32)
    # person A at columns 8, person B at columns 24, distinct tags
    for j in range(J):
        heat[0, 8 + j, 8, j] = 1.0
        tags[0, 8 + j, 8, j] = 1.0
        heat[0, 8 + j, 24, j] = 0.9
        tags[0, 8 + j, 24, j] = 4.0
    coords, scores, tvals, valid = parse_joint_heatmaps(
        jnp.asarray(heat), jnp.asarray(tags), max_person=4)
    persons = group_by_tags(np.asarray(coords[0]), np.asarray(scores[0]),
                            np.asarray(tvals[0]), np.asarray(valid[0]))
    assert len(persons) == 2
    full = [p for p in persons if (p[:, 2] > 0).all()]
    assert len(full) == 2
    xs = sorted(p[0, 0] for p in persons)
    assert xs == [8.0, 24.0]
