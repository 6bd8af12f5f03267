"""End-to-end CLI smoke: train on a tiny synthetic D-NeRF scene, then render.

Exercises the full stack the way a user would: dataset on disk -> Scene reader
-> trainer host loop (densify + opacity reset + SH schedule + saves) ->
render CLI loading the exported PLY + nets.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic_scene import build_blender_scene  # noqa: E402


@pytest.mark.slow
def test_train_and_render_cli(tmp_path):
    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "out")
    build_blender_scene(scene_dir, n_views=4, n_test=1, size=48, n_blobs=8)

    from gs_deformable_tpu import train as train_cli

    argv = [
        "-s", scene_dir, "-m", model_dir,
        "--iterations", "24",
        "--random_init_points", "200",
        "--instance_capacity", "4096",
        "--chunk", "8",
        "--warmup_iters", "4",
        "--sh_degree", "1",
        "--densify_from_iter", "6",
        "--densification_interval", "8",
        "--densify_until_iter", "20",
        "--opacity_reset_interval", "1000",
        "--test_iterations", "20",
        "--save_iterations", "24",
        "--eval",
        "--quiet",
        "--disable_viewer",
    ]
    train_cli.main(argv)

    pc = os.path.join(model_dir, "point_cloud", "iteration_24", "point_cloud.ply")
    assert os.path.exists(pc)
    assert os.path.exists(os.path.join(model_dir, "cfg_args"))
    assert os.path.exists(os.path.join(model_dir, "cameras.json"))
    assert os.path.exists(
        os.path.join(model_dir, "point_cloud", "iteration_24", "offset_model.npz")
    )

    from gs_deformable_tpu import render_cli

    render_cli.main(["-m", model_dir, "--skip_train"])
    renders = os.path.join(model_dir, "test", "ours_24", "renders")
    files = os.listdir(renders)
    assert len(files) == 1
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(renders, files[0])))
    assert img.shape[:2] == (48, 48)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """--start_checkpoint resume (reference train.py:99-113)."""
    scene_dir = str(tmp_path / "scene")
    m1 = str(tmp_path / "m1")
    build_blender_scene(scene_dir, n_views=3, n_test=1, size=32, n_blobs=6)

    from gs_deformable_tpu import train as train_cli

    base = [
        "-s", scene_dir,
        "--random_init_points", "100",
        "--instance_capacity", "2048",
        "--chunk", "8", "--sh_degree", "0", "--warmup_iters", "3",
        "--densify_from_iter", "100000", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--quiet", "--disable_viewer",
    ]
    train_cli.main(base + ["-m", m1, "--iterations", "10",
                           "--checkpoint_iterations", "8"])
    ckpt = os.path.join(m1, "ckpt_save", "chkpnt_8.npz")
    assert os.path.exists(ckpt)
    m2 = str(tmp_path / "m2")
    train_cli.main(base + ["-m", m2, "--iterations", "12",
                           "--start_checkpoint", ckpt])
    assert os.path.exists(os.path.join(m2, "point_cloud", "iteration_12"))


@pytest.mark.slow
def test_se3_mode_trains(tmp_path):
    """--deform_mode se3: SE(3) exp-map deformation end to end (BASELINE config 3)."""
    scene_dir = str(tmp_path / "scene")
    out = str(tmp_path / "se3")
    build_blender_scene(scene_dir, n_views=3, n_test=1, size=32, n_blobs=6)

    from gs_deformable_tpu import train as train_cli

    train_cli.main([
        "-s", scene_dir, "-m", out, "--iterations", "12",
        "--deform_mode", "se3",
        "--random_init_points", "100", "--instance_capacity", "2048",
        "--chunk", "8", "--sh_degree", "0", "--warmup_iters", "3",
        "--densify_from_iter", "100000", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "12",
        "--quiet", "--disable_viewer",
    ])
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_12",
                                       "point_cloud.ply"))


@pytest.mark.slow
def test_colmap_scene_trains(tmp_path):
    """Full training loop on a COLMAP-layout monocular video scene
    (BASELINE config 4: densify + TPU k-NN init + Adam on COLMAP data)."""
    from test_readers import build_colmap_scene

    root = build_colmap_scene(str(tmp_path / "colmap"), n_frames=4, size=32)
    out = str(tmp_path / "m")

    from gs_deformable_tpu import train as train_cli

    train_cli.main([
        "-s", root, "-m", out, "--iterations", "14",
        "--random_init_points", "120", "--instance_capacity", "2048",
        "--chunk", "8", "--sh_degree", "0", "--warmup_iters", "3",
        "--densify_from_iter", "6", "--densification_interval", "6",
        "--densify_until_iter", "12", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "14",
        "--quiet", "--disable_viewer",
    ])
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_14",
                                       "point_cloud.ply"))


@pytest.mark.slow
def test_multichip_cli_trains(tmp_path):
    """--n_data/--n_model wire the sharded step + sharded densify/reset into
    the trainer host loop (2x2 mesh on the 8-device CPU harness)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "out")
    build_blender_scene(scene_dir, n_views=4, n_test=1, size=48, n_blobs=8)

    from gs_deformable_tpu import train as train_cli

    argv = [
        "-s", scene_dir, "-m", model_dir,
        "--iterations", "16",
        "--random_init_points", "200",
        "--instance_capacity", "4096",
        "--chunk", "8",
        "--warmup_iters", "4",
        "--sh_degree", "1",
        "--densify_from_iter", "4",
        "--densification_interval", "6",
        "--densify_until_iter", "14",
        "--opacity_reset_interval", "12",
        "--test_iterations", "16",
        "--save_iterations", "16",
        "--n_data", "2",
        "--n_model", "2",
        "--eval",
        "--quiet",
        "--disable_viewer",
    ]
    train_cli.main(argv)
    pc = os.path.join(model_dir, "point_cloud", "iteration_16", "point_cloud.ply")
    assert os.path.exists(pc)

    from gs_deformable_tpu import render_cli

    render_cli.main(["-m", model_dir, "--skip_train"])
    renders = os.path.join(model_dir, "test", "ours_16", "renders")
    files = os.listdir(renders)
    assert len(files) == 1
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(renders, files[0])))
    assert np.isfinite(img).all()
