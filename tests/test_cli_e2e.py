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


@pytest.mark.slow
def test_opacity_mask_eval_reload_bitwise(tmp_path):
    """VERDICT r3 #7: a model trained with --use_opacity_mask must render
    IDENTICALLY after reload through the render_cli PLY path as from the
    train-time checkpoint state — i.e. all five deformation nets (not just
    offset_model) are restored at eval time (gaussian_model.py:1009-1024)."""
    import jax
    import jax.numpy as jnp

    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "out")
    build_blender_scene(scene_dir, n_views=3, n_test=1, size=32, n_blobs=6)

    from gs_deformable_tpu import train as train_cli

    train_cli.main([
        "-s", scene_dir, "-m", model_dir, "--iterations", "10",
        "--use_opacity_mask",
        "--random_init_points", "120", "--capacity", "256",
        "--instance_capacity", "2048",
        "--chunk", "8", "--sh_degree", "0", "--warmup_iters", "3",
        "--densify_from_iter", "100000", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "10",
        "--checkpoint_iterations", "10",
        "--eval", "--quiet", "--disable_viewer",
    ])

    from gs_deformable_tpu import render_cli, training
    from gs_deformable_tpu.io import checkpoint as ckpt_io
    from gs_deformable_tpu.io import model_ply
    from gs_deformable_tpu.data.scene import Scene
    from gs_deformable_tpu.train import cam_arrays, config_from_args

    pc_dir = os.path.join(model_dir, "point_cloud", "iteration_10")
    for fname in ("offset_model", "offset_model_rot", "offset_model_scaling",
                  "opacity_mask", "shs_model"):
        assert os.path.exists(os.path.join(pc_dir, f"{fname}.npz")), fname

    targs = render_cli.combined_args(model_dir, [])
    assert targs.use_opacity_mask  # saved cfg_args carries the flag
    cfg = config_from_args(targs)

    # A: train-time state from the checkpoint (the full TrainState pytree).
    state_ply, active_sh = model_ply.load_ply(
        os.path.join(pc_dir, "point_cloud.ply"), capacity=256, sh_degree=0)
    template = training.init_train_state(state_ply, 0, cfg)
    ts_ckpt, it = ckpt_io.load_checkpoint(
        os.path.join(model_dir, "ckpt_save", "chkpnt_10.npz"), template)
    assert it == 10

    # B: the render_cli loading path (PLY + all five nets).
    ts_ply = training.init_train_state(state_ply, 0, cfg)
    ts_ply, n_nets = render_cli.restore_nets(ts_ply, pc_dir)
    assert n_nets == 5

    scene = Scene(source_path=scene_dir, model_path="", eval=True,
                  shuffle=False)
    cam = scene.get_test_cameras()[0]
    ev = training.make_eval_render(
        cfg, width=cam.width, height=cam.height, tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy, active_sh_degree=active_sh)
    bg = jnp.zeros(3)
    img_ckpt = np.asarray(ev(ts_ckpt, cam_arrays(cam), bg, jnp.asarray(10**9)))
    img_ply = np.asarray(ev(ts_ply, cam_arrays(cam), bg, jnp.asarray(10**9)))
    assert np.isfinite(img_ckpt).all()
    np.testing.assert_array_equal(img_ply, img_ckpt)

    # The mask must actually be CONSUMED at eval: a perturbed opacity-mask
    # net must change the rendered image.
    lat = dict(ts_ply.latent)
    lat["opacity_mask"] = jax.tree_util.tree_map(
        lambda x: x + 0.5, lat["opacity_mask"])
    img_pert = np.asarray(ev(ts_ply.replace(latent=lat), cam_arrays(cam), bg,
                             jnp.asarray(10**9)))
    assert np.abs(img_pert - img_ply).max() > 1e-6


@pytest.mark.slow
def test_render_cli_arg_overlay(tmp_path):
    """get_combined_args semantics: eval-time CLI flags overlay cfg_args
    (arguments/__init__.py:91-111) — here --white_background at eval time."""
    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "out")
    build_blender_scene(scene_dir, n_views=3, n_test=1, size=32, n_blobs=6)

    from gs_deformable_tpu import train as train_cli

    train_cli.main([
        "-s", scene_dir, "-m", model_dir, "--iterations", "8",
        "--random_init_points", "100", "--instance_capacity", "2048",
        "--chunk", "8", "--sh_degree", "0", "--warmup_iters", "3",
        "--densify_from_iter", "100000", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "8",
        "--eval", "--quiet", "--disable_viewer",
    ])

    from gs_deformable_tpu import render_cli

    # Saved run was black-background; overlay must flip it.
    targs = render_cli.combined_args(model_dir, ["--white_background"])
    assert targs.white_background
    # Un-overlaid value comes from cfg_args.
    targs2 = render_cli.combined_args(model_dir, [])
    assert not targs2.white_background
    assert targs2.source_path == scene_dir

    # And the full CLI accepts overlay flags end to end.
    render_cli.main(["-m", model_dir, "--skip_train", "--white_background"])
    renders = os.path.join(model_dir, "test", "ours_8", "renders")
    assert len(os.listdir(renders)) == 1
