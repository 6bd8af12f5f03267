"""SH eval vs an independent numpy oracle (reference: utils/sh_utils.py:57-112,
forward.cu:20-71)."""

import numpy as np
import jax.numpy as jnp

from gs_deformable_tpu.ops import sh as sh_ops


def numpy_sh_basis(deg, d):
    """Independent real-SH basis, assembled from the standard closed forms."""
    x, y, z = d
    vals = [0.28209479177387814]
    if deg >= 1:
        c1 = 0.4886025119029199
        vals += [-c1 * y, c1 * z, -c1 * x]
    if deg >= 2:
        vals += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.31539156525252005 * (2 * z * z - x * x - y * y),
            -1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ]
    if deg >= 3:
        vals += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    return np.array(vals)


def test_eval_sh_matches_numpy_oracle(rng):
    for deg in range(4):
        K = (deg + 1) ** 2
        n = 32
        shc = rng.normal(size=(n, 3, K)).astype(np.float32)
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = np.asarray(sh_ops.eval_sh(deg, jnp.asarray(shc), jnp.asarray(dirs)))
        want = np.stack(
            [shc[i] @ numpy_sh_basis(deg, dirs[i]) for i in range(n)]
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_eval_sh_color_clamps_and_offsets(rng):
    n, K = 16, 16
    shc = rng.normal(size=(n, K, 3)).astype(np.float32)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    campos = np.array([0.0, 0.0, -5.0], np.float32)
    out = np.asarray(sh_ops.eval_sh_color(3, jnp.asarray(shc), jnp.asarray(means), jnp.asarray(campos)))
    assert (out >= 0).all()
    dirs = means - campos
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    want = np.stack(
        [np.maximum(shc[i].T @ numpy_sh_basis(3, dirs[i]) + 0.5, 0.0) for i in range(n)]
    )
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_rgb2sh_roundtrip(rng):
    rgb = rng.uniform(size=(10, 3)).astype(np.float32)
    back = np.asarray(sh_ops.sh2rgb(sh_ops.rgb2sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-6, atol=1e-6)
