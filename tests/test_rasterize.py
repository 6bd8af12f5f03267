"""Tiled Pallas rasterizer vs the dense oracle: forward image and gradients.

This is BASELINE.json configs 1-2: image parity and parameter-gradient parity.
The dense oracle (ops/rasterize_dense.py) replicates the CUDA reference
semantics exactly; agreement here transfers that parity to the tiled kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_deformable_tpu.config import RasterizeConfig
from gs_deformable_tpu.ops import projection as proj
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.rasterize import rasterize_arrays, render_gaussians
from gs_deformable_tpu.ops.rasterize_dense import rasterize_dense

W, H = 80, 48
# tile_cull off: these suites pin reference-faithful instance indexing
# (n_contrib) against the dense oracle; the cull's image-exactness has its
# own dedicated test below.
CFG = RasterizeConfig(instance_capacity=4096, chunk=8, tile_cull=False)


def make_scene(rng, n=200, seed_depth_ties=False):
    fovx, fovy = 0.9, 0.7
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    full = view @ projm
    means = np.stack(
        [rng.uniform(-1.6, 1.6, n), rng.uniform(-1.0, 1.0, n), rng.uniform(2.5, 9.0, n)],
        -1,
    ).astype(np.float32)
    if seed_depth_ties:
        means[: n // 4, 2] = 4.0  # exact depth ties exercise sort stability
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(n, 3)) * 0.5 - 2.4).astype(np.float32)
    cov6 = tf.build_cov3d(jnp.asarray(s), jnp.asarray(q, jnp.float32))
    colors = jnp.asarray(rng.uniform(0.0, 1.0, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.98, n), jnp.float32)
    pre = proj.preprocess(
        jnp.asarray(means), cov6, jnp.asarray(view), jnp.asarray(full),
        width=W, height=H, tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
    )
    return pre, opac, colors, (jnp.asarray(means), jnp.asarray(s), jnp.asarray(q, jnp.float32),
                               view, full, fovx, fovy)


@pytest.mark.parametrize("ties", [False, True])
def test_forward_matches_dense(rng, ties):
    pre, opac, colors, _ = make_scene(rng, seed_depth_ties=ties)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    dense = rasterize_dense(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.mask, bg, width=W, height=H,
    )
    img, final_t, n_contrib, required, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=CFG,
    )
    assert int(required) <= CFG.instance_capacity
    np.testing.assert_allclose(np.asarray(img), np.asarray(dense.color), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(final_t), np.asarray(dense.final_t), rtol=1e-4, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(n_contrib), np.asarray(dense.n_contrib))


def test_gradients_match_dense(rng):
    pre, opac, colors, _ = make_scene(rng, n=120)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

    def loss_dense(p2d, con, op, col):
        out = rasterize_dense(
            p2d, pre.depths, con, op, col, pre.rect, pre.mask, bg, width=W, height=H
        )
        return jnp.sum(out.color * wimg) + jnp.sum(out.final_t * wt)

    def loss_tiled(p2d, con, op, col):
        img, final_t, _, _, _ = rasterize_arrays(
            p2d, pre.depths, con, op, col, pre.rect, pre.tiles_touched, bg,
            width=W, height=H, cfg=CFG,
        )
        return jnp.sum(img * wimg) + jnp.sum(final_t * wt)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(
        pre.means2d_pix, pre.conics, opac, colors
    )
    gt = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(
        pre.means2d_pix, pre.conics, opac, colors
    )
    names = ["means2d", "conics", "opacity", "colors"]
    for name, a, b in zip(names, gd, gt):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5 * scale, err_msg=name)


def test_full_render_gradients_finite_and_match_dense_path(rng):
    """End-to-end render_gaussians: gradients to 3D params via tiled path equal
    the dense path through the same differentiable preprocess."""
    pre, opac, colors, (means, s, q, view, full, fovx, fovy) = make_scene(rng, n=80)
    bg = jnp.zeros(3)
    K = 16
    shs = jnp.asarray(rng.normal(size=(80, K, 3)) * 0.3, jnp.float32)
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    log_s = jnp.log(s)
    inv_op = jnp.log(opac / (1 - opac))

    def fwd(mu, ls, qq, io, sh_, use_dense):
        scales = jnp.exp(ls)
        rots = qq / jnp.linalg.norm(qq, axis=-1, keepdims=True)
        op = jax.nn.sigmoid(io)
        cov6 = tf.build_cov3d(scales, rots)
        p = proj.preprocess(
            mu, cov6, jnp.asarray(view), jnp.asarray(full),
            width=W, height=H, tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
        )
        from gs_deformable_tpu.ops import sh as sh_ops
        col = sh_ops.eval_sh_color(3, sh_, mu, jnp.zeros(3))
        if use_dense:
            out = rasterize_dense(
                p.means2d_pix, p.depths, p.conics, op, col, p.rect, p.mask, bg,
                width=W, height=H,
            )
            return jnp.sum(out.color * wimg)
        img, _, _, _, _ = rasterize_arrays(
            p.means2d_pix, p.depths, p.conics, op, col, p.rect, p.tiles_touched, bg,
            width=W, height=H, cfg=CFG,
        )
        return jnp.sum(img * wimg)

    args = (means, log_s, q, inv_op, shs)
    gd = jax.grad(lambda *a: fwd(*a, True), argnums=(0, 1, 2, 3, 4))(*args)
    gt = jax.grad(lambda *a: fwd(*a, False), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["means3d", "log_scales", "quats", "inv_opacity", "shs"], gd, gt):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all() and np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5 * scale, err_msg=name)


def test_overflow_surfaced(rng):
    pre, opac, colors, _ = make_scene(rng, n=200)
    small = RasterizeConfig(instance_capacity=256, chunk=8)
    img, final_t, _, required, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.tiles_touched, jnp.zeros(3), width=W, height=H, cfg=small,
    )
    assert int(required) > 256  # overflow reported, not silent
    assert np.isfinite(np.asarray(img)).all()


def test_empty_scene(rng):
    n = 8
    pre, opac, colors, _ = make_scene(rng, n=n)
    zero_tiles = jnp.zeros_like(pre.tiles_touched)
    bg = jnp.asarray([0.3, 0.6, 0.9])
    img, final_t, n_contrib, required, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, zero_tiles, bg, width=W, height=H, cfg=CFG,
    )
    assert int(required) == 0
    np.testing.assert_allclose(np.asarray(final_t), 1.0)
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(np.asarray(bg)[:, None, None], (3, H, W)),
        atol=1e-7,
    )


def test_packed_sort_matches_exact(rng):
    """sort_mode="packed" must reproduce the exact-mode image up to the
    documented sub-0.1%-depth tie reordering (none in a generic scene)."""
    pre, opac, colors, _ = make_scene(rng, n=150)
    bg = jnp.asarray([0.2, 0.2, 0.2])
    img_e, ft_e, _, _, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=CFG,
    )
    import dataclasses
    cfg_p = dataclasses.replace(CFG, sort_mode="packed")
    img_p, ft_p, _, _, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=cfg_p,
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_e), atol=1e-5)


def test_stream_matches_batch_composite(rng):
    """The stream-schedule kernel (flat chunk sweep, persistent VMEM state)
    must be bit-equivalent to the tile-batched kernel: same math, different
    schedule.  Covers forward image/T/n_contrib and input gradients."""
    import dataclasses

    pre, opac, colors, _ = make_scene(rng, n=180)
    bg = jnp.asarray([0.25, 0.5, 0.75])
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    outs = {}
    for mode, extra in [
        ("batch", {}),
        ("stream", {"stream_chunks": 3}),
        ("mixed", {"stream_chunks": 3}),
        # sub-chunk-aligned layout: ns = chunk/sub = 4 sub-blocks per chunk,
        # exercising the segmented scan + multi-open meta ring
        ("packed", {"stream_chunks": 3, "sub_chunk": 2}),
        ("packed", {"stream_chunks": 2, "sub_chunk": 4}),
    ]:
        cfg = dataclasses.replace(CFG, composite_mode=mode, **extra)

        def loss(op, col):
            img, ft, nc, req, _ = rasterize_arrays(
                pre.means2d_pix, pre.depths, pre.conics, op, col,
                pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=cfg,
            )
            return jnp.sum(img * wimg), (img, ft, nc)

        (lv, aux), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(opac, colors)
        outs[(mode, extra.get("sub_chunk", 0))] = (aux, grads)

    (img_b, ft_b, nc_b), g_b = outs[("batch", 0)]
    for mode, sub in [("stream", 0), ("mixed", 0),
                      ("packed", 2), ("packed", 4)]:
        (img_s, ft_s, nc_s), g_s = outs[(mode, sub)]
        np.testing.assert_array_equal(np.asarray(nc_s), np.asarray(nc_b))
        # batch/stream/mixed share the per-tile chunk partition and
        # match at the ~1-ulp fusion level; the packed layout partitions each
        # tile's scan at different (sub-aligned) chunk boundaries, so its
        # log-space prefix reassociates at the fp32 roundoff level instead.
        img_tol, grad_tol = (5e-6, 3e-5) if mode == "packed" else (1e-7, 3e-6)
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_b), atol=img_tol, err_msg=mode)
        np.testing.assert_allclose(
            np.asarray(ft_s), np.asarray(ft_b), atol=img_tol, err_msg=mode)
        for name, a, b in zip(["opacity", "colors"], g_b, g_s):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(
                a, b, atol=grad_tol * scale, err_msg=f"{mode}:{name}")


def test_stream_composite_edge_cases(rng):
    """Stream schedule under imbalance: a dominant tile (most instances in
    one tile) and an empty scene.  (Originally written for the deleted
    "section" schedule; the coverage — skewed tile loads through a chunk-
    stream kernel — applies to the stream backward the mixed default uses.)"""
    import dataclasses

    cfg = dataclasses.replace(CFG, composite_mode="stream", stream_chunks=2)
    cfg_ref = CFG  # batch

    # dominant tile: cluster most gaussians into one small screen region
    n = 150
    fovx, fovy = 0.9, 0.7
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    means = np.stack(
        [np.concatenate([rng.uniform(-0.05, 0.05, n - 10), rng.uniform(-1.5, 1.5, 10)]),
         np.concatenate([rng.uniform(-0.05, 0.05, n - 10), rng.uniform(-0.9, 0.9, 10)]),
         rng.uniform(2.5, 9.0, n)], -1).astype(np.float32)
    q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(n, 3)) * 0.5 - 2.6).astype(np.float32)
    cov6 = tf.build_cov3d(jnp.asarray(s), jnp.asarray(q, jnp.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    pre = proj.preprocess(
        jnp.asarray(means), cov6, jnp.asarray(view), jnp.asarray(view @ projm),
        width=W, height=H, tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
    )
    bg = jnp.asarray([0.3, 0.1, 0.6])
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

    def loss(c, op, col):
        img, ft, nc, _, _ = rasterize_arrays(
            pre.means2d_pix, pre.depths, pre.conics, op, col,
            pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=c,
        )
        return jnp.sum(img * wimg), (img, nc)

    (l_s, (img_s, nc_s)), g_s = jax.value_and_grad(
        lambda op, col: loss(cfg, op, col), argnums=(0, 1), has_aux=True
    )(opac, colors)
    (l_b, (img_b, nc_b)), g_b = jax.value_and_grad(
        lambda op, col: loss(cfg_ref, op, col), argnums=(0, 1), has_aux=True
    )(opac, colors)
    np.testing.assert_array_equal(np.asarray(nc_s), np.asarray(nc_b))
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_b), atol=1e-7)
    for a, b in zip(g_s, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # empty scene through the stream path
    img, ft, nc, req, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, jnp.zeros_like(pre.tiles_touched), bg,
        width=W, height=H, cfg=cfg,
    )
    assert int(req) == 0
    np.testing.assert_allclose(np.asarray(ft), 1.0)


def test_tile32_matches_dense(rng):
    """Non-default tile size (32x32): binning/kernels are tile-size generic;
    the oracle uses the same tile granularity for its rect masking."""
    import dataclasses
    from gs_deformable_tpu.ops.rasterize_types import CompositeParams

    cfg32 = dataclasses.replace(CFG, tile_x=32, tile_y=32)
    pre, opac, colors, _ = make_scene(rng, n=150)
    # recompute preprocess rects at 32px granularity
    fovx, fovy = 0.9, 0.7
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    # reuse the scene's screen-space arrays but re-derive rect/tiles at 32px
    # granularity via preprocess on the same inputs
    # (simplest: re-run make_scene's preprocess with tile sizes)
    pre32 = proj.preprocess(
        jnp.zeros((1, 3)), jnp.zeros((1, 6)), jnp.asarray(view),
        jnp.asarray(view @ projm), width=W, height=H,
        tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
        tile_x=32, tile_y=32,
    )  # only to prove the API accepts it; real rects below
    rng2 = np.random.default_rng(1)
    n = 150
    means = np.stack(
        [rng2.uniform(-1.6, 1.6, n), rng2.uniform(-1.0, 1.0, n), rng2.uniform(2.5, 9.0, n)],
        -1,
    ).astype(np.float32)
    q = rng2.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng2.normal(size=(n, 3)) * 0.5 - 2.4).astype(np.float32)
    cov6 = tf.build_cov3d(jnp.asarray(s), jnp.asarray(q, jnp.float32))
    colors = jnp.asarray(rng2.uniform(0, 1, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng2.uniform(0.2, 0.98, n), jnp.float32)
    p = proj.preprocess(
        jnp.asarray(means), cov6, jnp.asarray(view), jnp.asarray(view @ projm),
        width=W, height=H, tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
        tile_x=32, tile_y=32,
    )
    bg = jnp.asarray([0.1, 0.5, 0.9])
    from gs_deformable_tpu.ops.rasterize_dense import rasterize_dense as rd
    dense = rd(p.means2d_pix, p.depths, p.conics, opac, colors, p.rect, p.mask,
               bg, width=W, height=H, params=CompositeParams(tile_x=32, tile_y=32))
    img, ft, nc, req, _ = rasterize_arrays(
        p.means2d_pix, p.depths, p.conics, opac, colors, p.rect,
        p.tiles_touched, bg, width=W, height=H, cfg=cfg32,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(dense.color),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(dense.n_contrib))


def test_gradients_match_finite_differences(rng):
    """Finite-difference check of the custom_vjp core (SURVEY.md section 4
    item 3): directional derivative through the tiled rasterizer."""
    pre, opac, colors, _ = make_scene(rng, n=60)
    bg = jnp.zeros(3)
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

    def loss(op, col):
        img, _, _, _, _ = rasterize_arrays(
            pre.means2d_pix, pre.depths, pre.conics, op, col,
            pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=CFG,
        )
        return jnp.sum(img * wimg)

    g_op, g_col = jax.grad(loss, argnums=(0, 1))(opac, colors)
    d_op = jnp.asarray(rng.normal(size=opac.shape), jnp.float32) * 0.01
    d_col = jnp.asarray(rng.normal(size=colors.shape), jnp.float32) * 0.01
    eps = 1e-3
    num = (loss(opac + eps * d_op, colors + eps * d_col)
           - loss(opac - eps * d_op, colors - eps * d_col)) / (2 * eps)
    ana = jnp.sum(g_op * d_op) + jnp.sum(g_col * d_col)
    np.testing.assert_allclose(float(num), float(ana), rtol=2e-2)


def test_opacity_aware_culling_image_exact(rng):
    """Opacity-aware radii drop only alpha<1/255 instances: image and
    gradients identical to the 3-sigma reference radii, fewer instances."""
    import dataclasses
    fovx, fovy = 0.9, 0.7
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    rng2 = np.random.default_rng(5)
    n = 150
    means = np.stack(
        [rng2.uniform(-1.6, 1.6, n), rng2.uniform(-1.0, 1.0, n), rng2.uniform(2.5, 9.0, n)],
        -1,
    ).astype(np.float32)
    q = rng2.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng2.normal(size=(n, 3)) * 0.5 - 2.4).astype(np.float32)
    cov6 = tf.build_cov3d(jnp.asarray(s), jnp.asarray(q, jnp.float32))
    colors = jnp.asarray(rng2.uniform(0, 1, (n, 3)), jnp.float32)
    # include plenty of low-opacity gaussians to exercise the shrink
    opac = jnp.asarray(rng2.uniform(0.005, 0.6, n), jnp.float32)
    bg = jnp.asarray([0.4, 0.2, 0.1])
    wimg = jnp.asarray(rng2.normal(size=(3, H, W)), jnp.float32)

    results = {}
    for aware in [False, True]:
        pre = proj.preprocess(
            jnp.asarray(means), cov6, jnp.asarray(view), jnp.asarray(view @ projm),
            width=W, height=H, tan_fovx=np.tan(fovx / 2), tan_fovy=np.tan(fovy / 2),
            opacities=opac if aware else None,
        )

        def loss(op, col):
            img, ft, nc, req, _ = rasterize_arrays(
                pre.means2d_pix, pre.depths, pre.conics, op, col,
                pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=CFG,
            )
            return jnp.sum(img * wimg), (img, req)

        (lv, (img, req)), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(opac, colors)
        results[aware] = (np.asarray(img), int(req), [np.asarray(g) for g in grads])

    img_e, req_e, g_e = results[False]
    img_a, req_a, g_a = results[True]
    assert req_a < req_e  # instances actually dropped
    np.testing.assert_allclose(img_a, img_e, rtol=1e-5, atol=1e-6)
    for a, b in zip(g_a, g_e):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_linear_scan_matches_dense_and_log(rng):
    """scan_mode="linear" (Hillis-Steele prefix product, no transcendentals)
    must match the dense oracle within the standard tolerances, keep
    n_contrib exact, and agree with the log-space scan across schedules."""
    import dataclasses

    pre, opac, colors, _ = make_scene(rng, n=220, seed_depth_ties=True)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    dense = rasterize_dense(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.mask, bg, width=W, height=H,
    )

    outs = {}
    for key, mode, scan in [
        ("log", "batch", "log"),
        ("lin-batch", "batch", "linear"),
        ("lin-mixed", "mixed", "linear"),
        ("lin-stream", "stream", "linear"),
    ]:
        cfg = dataclasses.replace(
            CFG, composite_mode=mode, scan_mode=scan, stream_chunks=3)

        def loss(op, col):
            img, ft, nc, req, _ = rasterize_arrays(
                pre.means2d_pix, pre.depths, pre.conics, op, col,
                pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=cfg,
            )
            return jnp.sum(img * wimg), (img, ft, nc)

        (lv, aux), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(opac, colors)
        outs[key] = (aux, grads)

    (img_l, ft_l, nc_l), g_l = outs["lin-batch"]
    # vs the dense oracle: same tolerances as the log scan's parity test
    np.testing.assert_allclose(
        np.asarray(img_l), np.asarray(dense.color), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ft_l), np.asarray(dense.final_t), rtol=1e-4, atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(nc_l), np.asarray(dense.n_contrib))
    # vs the log scan: tiny float-rounding differences only
    (img_b, ft_b, nc_b), g_b = outs["log"]
    np.testing.assert_array_equal(np.asarray(nc_l), np.asarray(nc_b))
    np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_b), atol=1e-5)
    for name, a, b in zip(["opacity", "colors"], g_b, g_l):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5 * scale, err_msg=name)
    # linear scan is schedule-invariant (up to ~1-ulp fusion reassociation
    # of the backward between kernel layouts)
    for key in ["lin-mixed", "lin-stream"]:
        (img_s, ft_s, nc_s), g_s = outs[key]
        np.testing.assert_array_equal(np.asarray(nc_s), np.asarray(nc_l))
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_l), atol=1e-7, err_msg=key)
        for name, a, b in zip(["opacity", "colors"], g_l, g_s):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(
                a, b, atol=3e-6 * scale, err_msg=f"{key}:{name}")


def test_tile_cull_image_exact(rng):
    """tile_cull drops only (gaussian, tile) instances the kernel would skip
    at every pixel: contributions are exactly unchanged, so images and
    gradients agree to float-rounding (dropped rows re-pack the chunks, which
    reassociates the prefix-scan arithmetic at the ~1e-7 level — the same
    class of difference as opacity_aware_radius).  Instance counts shrink and
    n_contrib never grows.  Exercised with mixed opacities and anisotropic
    splats (AABB corner tiles are where the cull bites)."""
    import dataclasses

    pre, opac, colors, _ = make_scene(rng, n=250)
    # stretch some splats to force anisotropic rects
    con = np.array(pre.conics)
    con[::3, 0] *= 6.0  # shrink x reach -> tall ellipses inside wide AABBs
    conics = jnp.asarray(con)
    opac = opac.at[::5].set(0.02)  # low-opacity -> small reach ellipses
    bg = jnp.asarray([0.3, 0.2, 0.1])
    wimg = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

    outs = {}
    for cull in [False, True]:
        cfg = dataclasses.replace(CFG, tile_cull=cull)

        def loss(op, col, p2d, cn):
            img, ft, nc, req, _ = rasterize_arrays(
                p2d, pre.depths, cn, op, col,
                pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=cfg,
            )
            return jnp.sum(img * wimg), (img, ft, nc, req)

        (lv, aux), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(opac, colors, pre.means2d_pix, conics)
        outs[cull] = (aux, grads)

    (img0, ft0, nc0, req0), g0 = outs[False]
    (img1, ft1, nc1, req1), g1 = outs[True]
    assert int(req1) < int(req0), "cull should drop some instances here"
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ft1), np.asarray(ft0), rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(nc1) <= np.asarray(nc0))
    for name, a, b in zip(["opacity", "colors", "means2d", "conics"], g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6 * scale, err_msg=name)
