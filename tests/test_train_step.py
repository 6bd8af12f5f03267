"""End-to-end training step on a tiny synthetic scene (CPU, interpret mode).

Covers the fused step of training.py: deform MLP -> render -> loss -> backward
-> Adam, plus densify/opacity-reset scheduling pieces and capacity growth."""

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import (
    Config, DeformConfig, ModelConfig, RasterizeConfig,
)
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.renderer import CameraArrays
from gs_deformable_tpu import training
from gs_deformable_tpu.ops import transforms as tf

W, H = 48, 32


def tiny_config():
    return Config(
        model=ModelConfig(sh_degree=1),
        # sh_coeffs must equal (sh_degree+1)^2 so the shs head matches features
        deform=DeformConfig(depth=2, width=32, warmup_iters=5, sh_coeffs=4),
        raster=RasterizeConfig(instance_capacity=2048, chunk=8),
    )


def make_setup(rng, n=40, cap=64, sh_degree=1):
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n), rng.uniform(3, 6, n)], -1
    ).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=sh_degree)
    fov = 0.8
    view = np.eye(4, dtype=np.float32)
    proj = tf.projection_matrix(0.01, 100.0, fov, fov)
    cam = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.4),
    )
    return state, cam, fov


def test_train_step_reduces_loss(rng):
    cfg = tiny_config()
    state, cam, fov = make_setup(rng)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    bg = jnp.zeros(3)
    tan = float(np.tan(fov / 2))
    step = training.make_train_step(
        cfg, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=0, spatial_lr_scale=1.0,
    )
    losses = []
    for it in range(1, 16):
        ts, m = step(ts, cam, gt, bg, jnp.asarray(it))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(m["n_alive"]) == 40
    assert int(m["required_instances"]) <= cfg.raster.instance_capacity


def test_densify_and_reset_steps(rng):
    cfg = tiny_config()
    state, cam, fov = make_setup(rng)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    # seed stats so something densifies
    accum = np.zeros((64, 1), np.float32)
    accum[:10] = 1.0
    denom = np.zeros((64, 1), np.float32)
    denom[:40] = 1.0
    ts = ts.replace(
        gaussians=ts.gaussians.replace(
            xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom)
        )
    )
    densify = training.make_densify_step(cfg, extent=5.0, use_screen_prune=False)
    ts2, info = densify(ts, jnp.float32(0.5), jnp.float32(0.005))
    assert int(info["n_cloned"]) + int(info["n_split"]) > 0
    reset = training.make_opacity_reset(cfg)
    ts3 = reset(ts2)
    assert float(ts3.gaussians.get_opacity().max()) <= 0.01 + 1e-6
    assert float(jnp.abs(ts3.adam.mu["opacity"]).max()) == 0.0


def test_warmup_keeps_canonical(rng):
    """During warmup (iteration < warmup_iters) offsets are zero, so the
    offset-norm term must be exactly 0 (gaussian_model.py:308-313)."""
    cfg = tiny_config()
    state, cam, fov = make_setup(rng)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    tan = float(np.tan(fov / 2))
    step = training.make_train_step(
        cfg, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=0, spatial_lr_scale=1.0,
    )
    ts, m = step(ts, cam, gt, jnp.zeros(3), jnp.asarray(1))
    assert float(m["offset_norm"]) == 0.0


def test_grow_capacity(rng):
    cfg = tiny_config()
    state, cam, fov = make_setup(rng, n=40, cap=64)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    mu_before = np.asarray(ts.adam.mu["xyz"])
    ts2 = training.grow_capacity(ts, 128)
    assert ts2.gaussians.capacity == 128
    assert int(ts2.gaussians.num_alive) == 40
    np.testing.assert_array_equal(np.asarray(ts2.adam.mu["xyz"])[:64], mu_before)
    # deform params untouched
    assert jax.tree_util.tree_structure(ts2.deform) == jax.tree_util.tree_structure(ts.deform)
    # grown state still trains
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    tan = float(np.tan(fov / 2))
    step = training.make_train_step(
        cfg, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=0, spatial_lr_scale=1.0,
    )
    ts3, m = step(ts2, cam, gt, jnp.zeros(3), jnp.asarray(3))
    assert np.isfinite(float(m["loss"]))


def test_chunk_step_matches_per_step(rng):
    """Device-side chunked dispatch == per-step stepping (same cameras/gts),
    including the accumulated overflow counters."""
    cfg = tiny_config()
    state, cam, fov = make_setup(rng)
    gt0 = rng.uniform(0, 1, (4, 3, H, W)).astype(np.float32)
    bg = jnp.zeros(3)
    tan = float(np.tan(fov / 2))
    times = [0.1, 0.4, 0.7, 0.9]
    kw = dict(width=W, height=H, tan_fovx=tan, tan_fovy=tan,
              active_sh_degree=0, spatial_lr_scale=1.0)

    # Both step paths donate their TrainState; give each an independent copy
    # of the underlying buffers.
    state_a = jax.tree_util.tree_map(jnp.array, state)
    state_b = jax.tree_util.tree_map(jnp.array, state)
    ts_a = training.init_train_state(state_a, seed=0, cfg=cfg)
    step = training.make_train_step(cfg, **kw)
    for k in range(4):
        ts_a, m_a = step(ts_a, cam._replace(time=jnp.float32(times[k])),
                         jnp.asarray(gt0[k]), bg, jnp.asarray(7 + k))

    ts_b = training.init_train_state(state_b, seed=0, cfg=cfg)
    chunk = training.make_chunk_step(cfg, chunk_max=6, **kw)
    cam_stack = CameraArrays(
        world_view=jnp.stack([cam.world_view] * 6),
        full_proj=jnp.stack([cam.full_proj] * 6),
        camera_center=jnp.stack([cam.camera_center] * 6),
        time=jnp.asarray(times + [0.0, 0.0], jnp.float32),
    )
    gts = jnp.concatenate([jnp.asarray(gt0), jnp.zeros((2, 3, H, W))])
    ts_b, m_b = chunk(ts_b, cam_stack, gts, bg, jnp.asarray(7),
                      jnp.asarray(4))

    np.testing.assert_allclose(
        np.asarray(ts_a.gaussians.xyz), np.asarray(ts_b.gaussians.xyz),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ts_a.gaussians.opacity),
        np.asarray(ts_b.gaussians.opacity), rtol=1e-6, atol=1e-7)
    fa = jax.tree_util.tree_leaves(ts_a.deform)
    fb = jax.tree_util.tree_leaves(ts_b.deform)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert float(m_a["loss"]) == pytest_approx(float(m_b["loss"]))
    assert int(m_b["overflow_frames"]) == 0
    assert int(m_b["required_instances"]) >= int(m_a["required_instances"])


def pytest_approx(x, rel=1e-5):
    import pytest
    return pytest.approx(x, rel=rel)


def test_chunk_window_never_straddles_events():
    """chunk_end_iteration must stop chunks at (not across) host events."""
    import argparse
    from gs_deformable_tpu.train import chunk_end_iteration, post_step_event
    from gs_deformable_tpu.config import Config, OptimizationConfig

    cfg = Config(opt=OptimizationConfig(
        iterations=20000, densify_from_iter=500, densification_interval=100,
        densify_until_iter=15000, opacity_reset_interval=3000))
    args = argparse.Namespace(
        test_iterations=[7003, 15000], save_iterations=[20000],
        checkpoint_iterations=[], white_background=False)

    it = 0
    seen_ends = []
    while it < cfg.opt.iterations:
        it0 = it + 1
        end = chunk_end_iteration(it0, cfg, args, 10)
        assert it0 <= end <= cfg.opt.iterations
        assert end - it0 + 1 <= 10
        # no pre-step event strictly inside (SH bump at multiples of 1000)
        for e in range(it0 + 1, end + 1):
            assert e % 1000 != 0, (it0, end, e)
        # no post-step event strictly before the end
        for e in range(it0, end):
            assert not post_step_event(e, cfg, args), (it0, end, e)
        seen_ends.append(end)
        it = end

    # every event iteration is some chunk's end (so its host work runs)
    ends = set(seen_ends)
    for e in range(1, cfg.opt.iterations + 1):
        if post_step_event(e, cfg, args):
            assert e in ends, e
    assert cfg.opt.iterations in ends
