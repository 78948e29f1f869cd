"""World-view visualization suite: camera solve, renders, HTML export."""
import numpy as np


def test_solve_camera_pose_recovers_truth():
    from romp_tpu.vis.world_view import (
        get_cam_K, project_points, rot_pitch_yaw, solve_camera_pose,
    )

    rng = np.random.RandomState(0)
    K = get_cam_K(720, 1280)
    pitch_true, ty_true = 0.25, 1.3
    R = rot_pitch_yaw(pitch_true)
    t = np.array([0.0, ty_true, 0.0])
    pts = rng.randn(4, 17, 3) * 0.5 + np.array([0, 0, 6.0])
    obs = project_points(pts, K, R, t)
    pitch, tvec = solve_camera_pose(pts, obs, K)
    np.testing.assert_allclose(pitch, pitch_true, atol=1e-5)
    np.testing.assert_allclose(tvec[1], ty_true, atol=1e-4)


def test_render_world_frame_draws_meshes():
    from romp_tpu.vis.renderer import setup_renderer
    from romp_tpu.vis.world_view import render_world_frame

    renderer = setup_renderer("sim3dr")
    # one triangle "mesh" per person, 1m apart at the origin
    verts = np.array([
        [[-.3, 0, 0], [.3, 0, 0], [0, -1.2, 0]],
        [[0.7, 0, .5], [1.3, 0, .5], [1.0, -1.2, .5]]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    img = render_world_frame(renderer, verts, faces, [0, 1],
                             image_hw=(240, 320))
    assert img.shape == (240, 320, 3)
    assert (img != 255).any()          # something was drawn
    # empty scene: floor grid only, still valid
    img2 = render_world_frame(renderer, np.zeros((0, 3, 3)), faces, [],
                              image_hw=(240, 320))
    assert img2.shape == (240, 320, 3)


def test_topdown_and_html_export(tmp_path):
    from romp_tpu.vis.world_view import (
        draw_trajectory_topdown, export_html_viewer,
    )

    t0 = np.stack([np.linspace(-1, 1, 20), np.zeros(20),
                   np.linspace(2, 4, 20)], -1)
    t1 = t0 + np.array([1.0, 0, -1.0])
    t1[5] = np.nan                      # missing frame
    tracks = {0: t0, 3: t1}
    img = draw_trajectory_topdown(tracks, image_size=300)
    assert img.shape == (300, 300, 3)
    assert (img != 255).any()

    path = export_html_viewer(tracks, str(tmp_path / "traj.html"))
    html = open(path).read()
    assert "<canvas" in html and "SCENE" in html
    assert '"id": 3' in html and "null" in html      # NaN frame -> null
    assert "rgb(" in html


def test_visualize_global_trajectory_driver(tmp_path):
    from romp_tpu.vis.world_view import visualize_global_trajectory

    N, T = 2, 3
    faces = np.array([[0, 1, 2]], np.int32)
    outputs = {
        "track_ids": np.repeat([1, 2], T),
        "frame_ids": np.tile(np.arange(T), N),
        "frame_valid": np.ones(N * T, bool),
        "world_cams": np.random.RandomState(0).randn(N * T, 3),
        "verts": np.random.RandomState(1).randn(N * T, 3, 3) * 0.2,
    }
    files = visualize_global_trajectory(outputs, faces, str(tmp_path),
                                        image_hw=(120, 160))
    import os.path as osp

    assert len(files) == T + 2
    assert all(osp.exists(f) for f in files)
    assert files[-1].endswith("trajectories.html")
