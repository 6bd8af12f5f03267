"""Golden regression: fixed-seed oracle outputs and gradients must not drift.

The dense oracle is the parity anchor to the CUDA reference (see
ops/rasterize_dense.py); these committed arrays pin its exact behavior so any
future change to the compositing semantics — oracle OR tiled kernels — is
caught as a diff, the role the pre-captured CUDA tensors play in SURVEY.md
section 4 item (4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from test_rasterize import make_scene, W, H, CFG
from gs_deformable_tpu.ops.rasterize import rasterize_arrays
from gs_deformable_tpu.ops.rasterize_dense import rasterize_dense

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dense_oracle.npz")


def test_dense_oracle_matches_golden(rng):
    g = np.load(GOLDEN)
    pre, opac, colors, _ = make_scene(rng, n=200)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    out = rasterize_dense(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.mask, bg, width=W, height=H,
    )
    np.testing.assert_allclose(np.asarray(out.color), g["color"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.final_t), g["final_t"], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out.n_contrib), g["n_contrib"])

    def loss(p2d, con, op, col):
        o = rasterize_dense(
            p2d, pre.depths, con, op, col, pre.rect, pre.mask, bg,
            width=W, height=H,
        )
        return (o.color**2).sum() + (o.final_t**2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        pre.means2d_pix, pre.conics, opac, colors
    )
    for got, key in zip(grads, ["g_means2d", "g_conics", "g_opac", "g_colors"]):
        np.testing.assert_allclose(
            np.asarray(got), g[key], rtol=1e-5, atol=1e-6, err_msg=key
        )


def test_tiled_matches_golden(rng):
    g = np.load(GOLDEN)
    pre, opac, colors, _ = make_scene(rng, n=200)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    img, final_t, n_contrib, _, _ = rasterize_arrays(
        pre.means2d_pix, pre.depths, pre.conics, opac, colors,
        pre.rect, pre.tiles_touched, bg, width=W, height=H, cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(img), g["color"], rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(final_t), g["final_t"], rtol=1e-4, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(n_contrib), g["n_contrib"])
