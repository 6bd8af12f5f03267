"""Cross-check the two independent compositing oracles (VERDICT r1 item 5).

ops/rasterize_dense.py (jnp scan, the parity anchor for the Pallas kernels)
vs tests/oracle_numpy.py (NumPy per-pixel walk written from a fresh reading
of forward.cu:261-374 / backward.cu:401-560).  Agreement de-correlates
transcription errors: a mistake in either implementation of the CUDA
semantics would have to be made twice, independently, to pass.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.ops.rasterize_dense import rasterize_dense
from gs_deformable_tpu.ops.rasterize_types import CompositeParams

from oracle_numpy import composite_backward_np, composite_forward_np

W, H = 64, 48


def make_scene(seed=0, n=60):
    rng = np.random.default_rng(seed)
    means2d = rng.uniform(-5, [W + 5, H + 5], (n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 10.0, n).astype(np.float32)
    # a few exact depth ties to exercise the emission-order tiebreak
    depths[10] = depths[11] = depths[12]
    # random SPD conics with a spread of sizes
    a = rng.uniform(0.01, 0.8, n)
    c = rng.uniform(0.01, 0.8, n)
    b = rng.uniform(-0.9, 0.9, n) * np.sqrt(a * c)
    conics = np.stack([a, b, c], -1).astype(np.float32)
    opac = rng.uniform(0.02, 1.0, n).astype(np.float32)
    # a stack of co-located near-opaque gaussians so the T < 1e-4
    # first-hit termination fires at depth >= 3
    opac[:8] = 0.995
    means2d[:8] = np.asarray([W / 2, H / 2], np.float32) + rng.uniform(
        -2, 2, (8, 2)).astype(np.float32)
    a[:8] = c[:8] = 0.02
    b[:8] = 0.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    r = np.ceil(3.0 / np.sqrt(np.minimum(a, c))).astype(np.int32)
    x0 = np.clip((means2d[:, 0] - r) // 16, 0, W // 16).astype(np.int32)
    x1 = np.clip((means2d[:, 0] + r) // 16 + 1, 0, W // 16).astype(np.int32)
    y0 = np.clip((means2d[:, 1] - r) // 16, 0, H // 16).astype(np.int32)
    y1 = np.clip((means2d[:, 1] + r) // 16 + 1, 0, H // 16).astype(np.int32)
    rect = np.stack([x0, y0, x1, y1], -1)
    mask = rng.uniform(size=n) > 0.1
    return means2d, depths, conics, opac, colors, rect, mask


def test_oracles_agree_forward():
    means2d, depths, conics, opac, colors, rect, mask = make_scene()
    bg = np.asarray([0.2, 0.1, 0.5], np.float32)

    img_np, t_np, nc_np = composite_forward_np(
        means2d, depths, conics, opac, colors, rect, mask, bg,
        width=W, height=H)
    out = rasterize_dense(
        jnp.asarray(means2d), jnp.asarray(depths), jnp.asarray(conics),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(rect),
        jnp.asarray(mask), jnp.asarray(bg), width=W, height=H,
        params=CompositeParams(),
    )
    img_jnp = np.asarray(out.color)

    # Termination actually exercised?  A terminated pixel's T sticks at its
    # last pre-termination value, which by T*(1-alpha) < 1e-4 and
    # alpha <= 0.99 lies in [1e-4, 1e-2); the opaque stack drives pixels to
    # the floor of that band.
    assert (np.asarray(out.final_t) < 3e-4).any()
    np.testing.assert_array_equal(nc_np, np.asarray(out.n_contrib))
    np.testing.assert_allclose(t_np, np.asarray(out.final_t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(img_np, img_jnp, rtol=1e-6, atol=1e-6)


def test_oracles_agree_gradients():
    means2d, depths, conics, opac, colors, rect, mask = make_scene(seed=3)
    rng = np.random.default_rng(9)
    gc = rng.uniform(-1, 1, (3, H, W)).astype(np.float32)
    gt = rng.uniform(-1, 1, (H, W)).astype(np.float32)

    g_np = composite_backward_np(
        means2d, depths, conics, opac, colors, rect, mask, gc, gt,
        width=W, height=H)

    def loss(m2d, con, op, col):
        out = rasterize_dense(
            m2d, jnp.asarray(depths), con, op, col, jnp.asarray(rect),
            jnp.asarray(mask), jnp.zeros(3), width=W, height=H,
            params=CompositeParams(),
        )
        return (jnp.sum(out.color * jnp.asarray(gc))
                + jnp.sum(out.final_t * jnp.asarray(gt)))

    g_jax = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(opac),
        jnp.asarray(colors))

    for name, a, b in [
        ("means2d", g_np[0], np.asarray(g_jax[0])),
        ("conics", g_np[1], np.asarray(g_jax[1])),
        ("opacity", g_np[2], np.asarray(g_jax[2])),
        ("colors", g_np[3], np.asarray(g_jax[3])),
    ]:
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=2e-6, err_msg=name)
