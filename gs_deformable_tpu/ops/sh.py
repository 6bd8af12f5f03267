"""Real spherical-harmonics evaluation, degrees 0-4.

Semantics match the reference's two SH evaluators, which agree with each other:
the python-side ``eval_sh`` (/root/reference/utils/sh_utils.py:57-112) and the
CUDA ``computeColorFromSH`` (forward.cu:20-71).  ``eval_sh_color`` reproduces the
rasterizer path: evaluate SH along the (mean - campos) direction, add 0.5, clamp
at zero (the clamp mask of forward.cu:67-69 is exactly the autodiff gradient of
``jnp.maximum``).
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      deg: static degree 0..4.
      sh: (..., C, (deg+1)**2) coefficients (channel-major like sh_utils.py).
      dirs: (..., 3) unit directions.

    Returns: (..., C) values (no +0.5 offset, no clamp — pure basis eval,
    matching sh_utils.py:57-112).
    """
    assert 0 <= deg <= 4
    result = C0 * sh[..., 0]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4]
                + C2[1] * yz * sh[..., 5]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                + C2[3] * xz * sh[..., 7]
                + C2[4] * (xx - yy) * sh[..., 8]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9]
                    + C3[1] * xy * z * sh[..., 10]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13]
                    + C3[5] * z * (xx - yy) * sh[..., 14]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15]
                )
                if deg > 3:
                    result = (
                        result
                        + C4[0] * xy * (xx - yy) * sh[..., 16]
                        + C4[1] * yz * (3.0 * xx - yy) * sh[..., 17]
                        + C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18]
                        + C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19]
                        + C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20]
                        + C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21]
                        + C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22]
                        + C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23]
                        + C4[8] * (
                            xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)
                        ) * sh[..., 24]
                    )
    return result


def eval_sh_color(
    deg: int, sh: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray
) -> jnp.ndarray:
    """SH -> clamped RGB along view direction (forward.cu:20-71).

    Args:
      deg: static active SH degree.
      sh: (N, K, 3) coefficients, K >= (deg+1)**2, coefficient-major layout as
        stored by the model (features_dc ++ features_rest).
      means: (N, 3) gaussian centers (post-deformation, as passed to the
        rasterizer at gaussian_renderer/__init__.py:154).
      campos: (3,) camera center.

    Returns: (N, 3) RGB in [0, inf) after the +0.5 offset and zero clamp.
    """
    dirs = means - campos[None, :]
    # The 1e-12 floor only matters for a gaussian exactly at the camera center
    # (the CUDA forward.cu:27 would NaN there too) — it keeps backward clean.
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    # (N, K, 3) -> (N, 3, K) channel-major for eval_sh.
    vals = eval_sh(deg, jnp.swapaxes(sh, -1, -2), dirs)
    return jnp.maximum(vals + 0.5, 0.0)


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> DC coefficient (sh_utils.py:114-115)."""
    return (rgb - 0.5) / C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC coefficient -> RGB (sh_utils.py:117-118)."""
    return sh * C0 + 0.5
