"""Batched SE(3)/SO(3) exponential maps (JAX).

Re-derivation of the Nerfies rigid-body math that the reference ports to torch
at /root/reference/scene/rigid_body.py:16-100.  Used by the SE(3) deformation
variant (gaussian_model.py:99-173): a network predicts (w, v) per gaussian, the
screw axis is normalized by theta = |w|, and ``exp_se3`` integrates it into a
4x4 rigid transform applied to the canonical means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix (rigid_body.py:16-24)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula (rigid_body.py:61-65).

    Args: w (..., 3) unit rotation axes; theta (...,) angles.
    Returns: (..., 3, 3) rotations.
    """
    W = skew(w)
    th = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    WW = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    return eye + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * WW


def rp_to_se3(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotation + translation -> homogeneous 4x4 (rigid_body.py:41-45)."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, p[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Screw-axis exponential (rigid_body.py:86-93).

    Args: S (..., 6) screw axes [w, v] with |w| = 1; theta (...,) magnitudes.
    Returns: (..., 4, 4) rigid transforms.
    """
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    th = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    WW = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    V = th * eye + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * WW
    p = jnp.matmul(V, v[..., :, None],
                   precision=jax.lax.Precision.HIGHEST)[..., 0]
    return rp_to_se3(R, p)


def to_homogenous(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) with trailing 1 (rigid_body.py:96-97)."""
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogenous(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3) perspective divide (rigid_body.py:99-100)."""
    return v[..., :3] / v[..., -1:]
