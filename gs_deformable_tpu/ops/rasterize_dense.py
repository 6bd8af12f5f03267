"""Dense reference rasterizer — the correctness oracle.

An O(P * pixels) pure-jnp implementation of the exact compositing semantics of
the CUDA tile renderer (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:261-374), used only for tests and tiny scenes.  Every
detail is replicated:

- gaussians are processed in (depth, emission-order) sorted order, and only for
  pixels whose *tile* lies inside the gaussian's tile rect (a gaussian outside
  the 16x16 tile of a pixel never touches it, even if its falloff overlaps);
- ``alpha = min(0.99, opacity * exp(power))`` with skip conditions
  ``power > 0`` and ``alpha < 1/255`` (forward.cu:335-345);
- first-hit termination: a non-skipped splat whose ``T * (1-alpha) < 1e-4``
  sets the pixel done *without* contributing (forward.cu:346-351);
- output is ``C + T * bg`` plus final transmittance and the 1-based index of
  the last contributing instance (n_contrib, forward.cu:367-373).

The 0.99 clamp is applied straight-through for gradients: the reference
backward differentiates ``opacity * G`` without gating on the clamp
(backward.cu:500-505, 556), so autodiff through this oracle matches the CUDA
gradient convention exactly.

Because this oracle is differentiable by construction, ``jax.grad`` through it
provides oracle gradients for the Pallas ``custom_vjp`` kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize_types import CompositeParams


class DenseRenderOut(NamedTuple):
    color: jnp.ndarray  # (3, H, W) — without/with bg per `bg` argument
    final_t: jnp.ndarray  # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32


def _straight_through_min(x: jnp.ndarray, cap: float) -> jnp.ndarray:
    """min(x, cap) in the forward, identity in the backward."""
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def rasterize_dense(
    means2d_pix: jnp.ndarray,
    depths: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    rect: jnp.ndarray,
    mask: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    params: CompositeParams = CompositeParams(),
) -> DenseRenderOut:
    """Composite all gaussians over the full image via a scan in depth order.

    Args:
      means2d_pix: (P, 2) pixel-space centers.
      depths: (P,) view-space z (sort key, forward.cu:250 / rasterizer_impl.cu:303).
      conics: (P, 3) inverse 2D covariances (A, B, C).
      opacities: (P,) activated opacity.
      colors: (P, 3) per-gaussian RGB (post SH eval).
      rect: (P, 4) int32 tile rect [x0, y0, x1, y1).
      mask: (P,) bool visibility.
      bg: (3,) background color.
    """
    P = means2d_pix.shape[0]
    tx, ty = params.tile_x, params.tile_y

    # Stable depth sort == CUB radix sort over [tile | depth-bits] keys with
    # emission order (gaussian index) as the tiebreak (rasterizer_impl.cu:300-308).
    order = jnp.argsort(depths, stable=True)

    xs = jnp.arange(width, dtype=jnp.float32)[None, :]  # (1, W)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]  # (H, 1)
    tile_col = (jnp.arange(width, dtype=jnp.int32) // tx)[None, :]
    tile_row = (jnp.arange(height, dtype=jnp.int32) // ty)[:, None]

    def body(carry, g):
        T, done, C, count, last = carry
        xy = means2d_pix[g]
        con = conics[g]
        op = opacities[g]
        col = colors[g]
        r = rect[g]
        m = mask[g]

        in_rect = (
            (tile_col >= r[0]) & (tile_col < r[2]) & (tile_row >= r[1]) & (tile_row < r[3]) & m
        )
        dx = xy[0] - xs  # (H?, W) broadcast
        dy = xy[1] - ys
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = _straight_through_min(op * jnp.exp(power), params.alpha_max)
        skip = (power > 0.0) | (alpha < params.alpha_min) | (~in_rect)
        test_t = T * (1.0 - alpha)
        newly_done = (~skip) & (~done) & (test_t < params.transmittance_eps)
        contrib = (~skip) & (~done) & (~newly_done)

        C = C + jnp.where(contrib, alpha * T, 0.0)[None] * col[:, None, None]
        T = jnp.where(contrib, test_t, T)
        done = done | newly_done
        # 1-based instance counter within the pixel's tile range: every
        # in-rect instance increments it while the pixel is alive
        # (forward.cu:325-328); last contributing index is n_contrib.
        count = count + jnp.where(in_rect, 1, 0)
        last = jnp.where(contrib, count, last)
        return (T, done, C, count, last), None

    T0 = jnp.ones((height, width), jnp.float32)
    done0 = jnp.zeros((height, width), bool)
    C0 = jnp.zeros((3, height, width), jnp.float32)
    cnt0 = jnp.zeros((height, width), jnp.int32)
    last0 = jnp.zeros((height, width), jnp.int32)
    (T, done, C, count, last), _ = jax.lax.scan(
        body, (T0, done0, C0, cnt0, last0), order
    )

    color = C + T[None] * bg[:, None, None]
    return DenseRenderOut(color=color, final_t=T, n_contrib=last)
