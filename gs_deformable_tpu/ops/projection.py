"""Per-gaussian screen-space preprocessing (the TPU analog of FORWARD::preprocess).

This is the vectorized, fully differentiable re-design of the CUDA
``preprocessCUDA`` kernel (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:156-256).  One jnp map over all P gaussians — XLA
fuses the whole thing; there is no per-thread code.  Because it is plain
differentiable JAX, the analytic backward chains of backward.cu:144-396
(conic->cov2D->cov3D->scale/rot, projection->mean, fov-clamp gradient gates) are
obtained by autodiff of the same formulas instead of being hand-written.

Numerical details matched to the reference:
- near cull at view z <= 0.2            (auxiliary.h:154)
- w-epsilon 1e-7 in perspective divide  (forward.cu:199)
- 1.3 * tan_fov clamp of the EWA Jacobian input, whose autodiff gradient is
  exactly the `x_grad_mul` gate        (forward.cu:82-87, backward.cu:175-176)
- +0.3 low-pass on the 2D diagonal      (forward.cu:110-111)
- radius = ceil(3 sqrt(max eig)), 0.1 floor under the sqrt (forward.cu:229-232)
- ndc2Pix(v, S) = ((v+1) S - 1)/2       (auxiliary.h:41-44)
- tile rect via floor-div with clamping (auxiliary.h:46-56)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# TPU's default matmul precision is ONE bf16 pass; these matvecs carry
# world positions and camera matrices where 2^-8 relative rounding moves
# splats by pixels.  HIGHEST = full fp32 (matches the CUDA reference).
_EXACT = jax.lax.Precision.HIGHEST


def _mv(a, b):
    return jnp.matmul(a, b, precision=_EXACT)

NEAR_Z = 0.2
W_EPS = 1e-7
LOWPASS = 0.3


class PreprocessOut(NamedTuple):
    """Per-gaussian screen-space quantities; all shapes (P, ...)."""

    means2d_ndc: jnp.ndarray  # (P, 2) NDC xy — gradient tap for densification
    means2d_pix: jnp.ndarray  # (P, 2) pixel-space xy
    depths: jnp.ndarray  # (P,) view-space z
    conics: jnp.ndarray  # (P, 3) inverse 2D covariance (A, B, C)
    radii: jnp.ndarray  # (P,) int32 screen-space radius, 0 = culled
    rect: jnp.ndarray  # (P, 4) int32 [x0, y0, x1, y1) tile rect
    tiles_touched: jnp.ndarray  # (P,) int32
    mask: jnp.ndarray  # (P,) bool — survives all culls


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def mark_visible(
    means3d: jnp.ndarray, viewmatrix: jnp.ndarray, projmatrix: jnp.ndarray
) -> jnp.ndarray:
    """Standalone frustum-visibility test, (P,3) -> (P,) bool.

    The TPU analog of the rasterizer's third public entry point
    (``markVisible``, rasterize_points.cu:198-216 / ext.cpp:17): the same
    near-plane test the preprocess cull applies (auxiliary.h:139-164 checks
    view z > 0.2 only; the NDC bound checks there are dead ``false &&`` code,
    so visibility reduces to the near test).  ``projmatrix`` is accepted for
    signature parity and unused, as in the reference.
    """
    del projmatrix
    p_view_z = _mv(means3d, viewmatrix[:3, 2]) + viewmatrix[3, 2]
    return p_view_z > NEAR_Z


def tile_ellipse_mask(
    means2d_pix: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    rect: jnp.ndarray,
    tiles_touched: jnp.ndarray,
    *,
    tile_x: int,
    tile_y: int,
    max_bits: int = 16,
    slack: float = 0.02,
):
    """Exact per-tile ellipse cull for gaussians with small tile rects.

    The reference bins every tile in the radius AABB (auxiliary.h:46-56), but
    the compositing kernel skips any pixel with alpha < 1/255
    (forward.cu:343-344) — so a (gaussian, tile) instance whose *best* pixel
    is below that threshold contributes exactly nothing.  For each gaussian
    whose rect holds at most ``max_bits`` tiles, this tests every rect tile:
    the minimum of the conic quadratic form q(d) = A dx^2 + 2B dx dy + C dy^2
    over the tile's pixel-center box is found in closed form (interior test +
    four clamped edge minima) and kept only if q_min <= 2 ln(255 op) + slack
    (the same knife-edge slack the opacity-aware radius uses).  Corner tiles
    of the AABB that the ellipse misses are dropped.

    Dropped instances are rows the kernel would skip at every pixel: every
    contribution is exactly unchanged, so images and gradients agree to
    float rounding (the re-packed chunks reassociate the prefix scans at the
    ~1e-7 level, like opacity_aware_radius); the n_contrib debug counter (an
    instance *index*, never returned through the reference Python API) and
    the instance-capacity accounting shrink.

    Returns (mask_code, new_tiles_touched): ``mask_code`` is (P,) int32 with
    bit 16 set when the mask applies and bits 0..15 flagging surviving rect
    slots (slot i = tile (x0 + i mod w, y0 + i div w), the emission order of
    rasterizer_impl.cu:89-103); gaussians with larger rects keep bit 16 clear
    and their full rect count.
    """
    assert max_bits <= 16
    op = opacities[:, 0] if opacities.ndim == 2 else opacities
    op = jax.lax.stop_gradient(op)
    pix = jax.lax.stop_gradient(means2d_pix)
    con = jax.lax.stop_gradient(conics)
    x0, y0, x1 = rect[:, 0], rect[:, 1], rect[:, 2]
    w = jnp.maximum(x1 - x0, 1)
    a_c, b_c, c_c = con[:, 0], con[:, 1], con[:, 2]
    usable = (tiles_touched > 0) & (tiles_touched <= max_bits)
    usable &= (a_c > 0.0) & (c_c > 0.0)
    qthr = 2.0 * jnp.log(jnp.maximum(255.0 * op, 1.0)) + slack
    gx, gy = pix[:, 0], pix[:, 1]

    mask = jnp.zeros_like(tiles_touched)
    count = jnp.zeros_like(tiles_touched)
    for i in range(max_bits):
        iy = jnp.int32(i) // w
        ix = jnp.int32(i) - iy * w
        # dx = gx - px over the tile's pixel-center box -> dx in [ax, bx]
        px0 = ((x0 + ix) * tile_x).astype(jnp.float32)
        py0 = ((y0 + iy) * tile_y).astype(jnp.float32)
        ax = gx - (px0 + (tile_x - 1))
        bx = gx - px0
        ay = gy - (py0 + (tile_y - 1))
        by = gy - py0
        inside = (ax <= 0.0) & (bx >= 0.0) & (ay <= 0.0) & (by >= 0.0)

        def q_at(dx, dy):
            return a_c * dx * dx + 2.0 * b_c * dx * dy + c_c * dy * dy

        def edge_x(dxv):  # minimize over dy in [ay, by] at fixed dx
            dy = jnp.clip(-b_c * dxv / c_c, ay, by)
            return q_at(dxv, dy)

        def edge_y(dyv):
            dx = jnp.clip(-b_c * dyv / a_c, ax, bx)
            return q_at(dx, dyv)

        qmin = jnp.minimum(
            jnp.minimum(edge_x(ax), edge_x(bx)),
            jnp.minimum(edge_y(ay), edge_y(by)),
        )
        qmin = jnp.where(inside, 0.0, qmin)
        keep = (jnp.int32(i) < tiles_touched) & (qmin <= qthr)
        keep_i = keep.astype(jnp.int32)
        mask = mask | (keep_i << i)
        count = count + keep_i

    mask_code = jnp.where(usable, mask | (1 << 16), 0)
    new_tiles = jnp.where(usable, count, tiles_touched)
    return mask_code, new_tiles


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x: jnp.ndarray,
    focal_y: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to screen space (forward.cu:74-113).

    Args:
      means3d: (P, 3) world-space centers.
      cov3d: (P, 6) packed upper-triangular world covariance.
      viewmatrix: (4, 4) row-vector world->view transform (cameras.py:55).
    Returns: (P, 3) packed [c00, c01, c11] *after* the +0.3 low-pass.
    """
    t = _mv(means3d, viewmatrix[:3, :3]) + viewmatrix[3, :3]
    tz = t[:, 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # A = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]  (the EWA affine
    # approximation; forward.cu:89-92 builds the same J in glm column-major).
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    a00 = focal_x * inv_z
    a02 = -focal_x * tx * inv_z2
    a11 = focal_y * inv_z
    a12 = -focal_y * ty * inv_z2

    # Sigma_cam = W Sigma W^T with W the world->view rotation.  The reference's
    # T = W*J / cov = T^T Vrk^T T (forward.cu:94-106) reduces to the same.
    # Expanded to (P,) scalar arithmetic: a (P, 3, 3) einsum materializes
    # padded tiled layouts on TPU (minor dims of 3) at ~50x roofline traffic.
    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))
    sg = ((xx, xy, xz), (xy, yy, yz), (xz, yz, zz))
    # Wr[i, j] = viewmatrix[j, i] (row-vector convention), a traced scalar.
    tmp = [
        [
            sum(viewmatrix[j, i] * sg[j][k] for j in range(3))
            for k in range(3)
        ]
        for i in range(3)
    ]

    def scam(i, l):
        return sum(tmp[i][k] * viewmatrix[k, l] for k in range(3))

    s00, s01, s02 = scam(0, 0), scam(0, 1), scam(0, 2)
    s11, s12, s22 = scam(1, 1), scam(1, 2), scam(2, 2)

    # cov2d = A Sigma_cam A^T, rows of A as above.
    c00 = a00 * (a00 * s00 + a02 * s02) + a02 * (a00 * s02 + a02 * s22) + LOWPASS
    c01 = a11 * (a00 * s01 + a02 * s12) + a12 * (a00 * s02 + a02 * s22)
    c11 = a11 * (a11 * s11 + a12 * s12) + a12 * (a11 * s12 + a12 * s22) + LOWPASS
    return jnp.stack([c00, c01, c11], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    *,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    tile_x: int = 16,
    tile_y: int = 16,
    alive: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> PreprocessOut:
    """Project all gaussians to screen space and bin-count tiles.

    ``alive`` optionally masks out dead capacity slots (TPU fixed-capacity
    model state) — they behave exactly like frustum-culled gaussians.

    ``opacities`` (activated, (P,)) enables opacity-aware radius culling: the
    reference bins every tile inside the fixed 3-sigma box (forward.cu:232),
    but pixels beyond sqrt(2*ln(255*op))*sigma can never pass the alpha >=
    1/255 compositing threshold (forward.cu:344), so instances dropped by the
    tighter radius contribute exactly nothing to the image or its gradients —
    only the debug n_contrib counter and the radii of near-transparent
    gaussians change.  Pass None for bit-faithful reference radii.
    """
    P = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y

    # Near culling (auxiliary.h:139-164).
    p_view_z = _mv(means3d, viewmatrix[:3, 2]) + viewmatrix[3, 2]
    in_front = p_view_z > NEAR_Z

    # Projection (forward.cu:197-200).
    p_hom = _mv(means3d, projmatrix[:3, :]) + projmatrix[3, :]
    p_w = 1.0 / (p_hom[:, 3] + W_EPS)
    ndc = p_hom[:, :2] * p_w[:, None]

    cov2d = compute_cov2d(
        means3d, cov3d, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy
    )
    c00, c01, c11 = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conics = jnp.stack([c11 * det_inv, -c01 * det_inv, c00 * det_inv], axis=-1)

    # Screen-space radius (forward.cu:229-232).
    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam2 = mid - jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    if opacities is not None:
        op = opacities[:, 0] if opacities.ndim == 2 else opacities
        # stop_gradient: the radius is bookkeeping (like the reference's int
        # radii); without it, ceil's zero cotangent through sqrt(0) would NaN
        # the opacity gradients for op <= 1/255.
        op = jax.lax.stop_gradient(op)
        # +0.02 slack inside the contour: pixels on the exact alpha = 1/255
        # knife edge can round across it in fp32 compositing.
        nsigma = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * op) + 0.02, 0.0))
        nsigma = jnp.minimum(nsigma, 3.0)
    else:
        nsigma = 3.0
    sqrt_lam = jnp.sqrt(jnp.maximum(lam1, lam2))
    radius_f = jnp.ceil(nsigma * sqrt_lam)
    exact_upper_bound = opacities is not None

    pix = jnp.stack([ndc2pix(ndc[:, 0], width), ndc2pix(ndc[:, 1], height)], axis=-1)

    # Tile rect (auxiliary.h:46-56): floor-div + clamp is equivalent to the
    # C truncation there for every case that survives the clamps.
    x0 = jnp.clip(jnp.floor((pix[:, 0] - radius_f) / tile_x), 0, grid_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((pix[:, 1] - radius_f) / tile_y), 0, grid_y).astype(jnp.int32)
    if exact_upper_bound:
        # floor((p + r)/TILE) + 1 is the correct exclusive tile bound for a
        # FLOAT center (the reference's (p + r + TILE-1)/TILE, auxiliary.h:53,
        # assumes an integer numerator and can under-cover a fractional center
        # by one pixel).  Intersect with the reference 3-sigma rect so the
        # coverage — including that reference quirk — matches bit for bit
        # while sub-threshold tiles are still dropped.
        r3 = jnp.ceil(3.0 * sqrt_lam)
        x1 = jnp.minimum(
            jnp.floor((pix[:, 0] + radius_f) / tile_x) + 1,
            jnp.floor((pix[:, 0] + r3 + tile_x - 1) / tile_x),
        )
        y1 = jnp.minimum(
            jnp.floor((pix[:, 1] + radius_f) / tile_y) + 1,
            jnp.floor((pix[:, 1] + r3 + tile_y - 1) / tile_y),
        )
        x1 = jnp.clip(x1, 0, grid_x).astype(jnp.int32)
        y1 = jnp.clip(y1, 0, grid_y).astype(jnp.int32)
    else:
        x1 = jnp.clip(
            jnp.floor((pix[:, 0] + radius_f + tile_x - 1) / tile_x), 0, grid_x
        ).astype(jnp.int32)
        y1 = jnp.clip(
            jnp.floor((pix[:, 1] + radius_f + tile_y - 1) / tile_y), 0, grid_y
        ).astype(jnp.int32)
    ntiles = (x1 - x0) * (y1 - y0)

    mask = in_front & det_ok & (ntiles > 0)
    if alive is not None:
        mask = mask & alive

    radii = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(mask, ntiles, 0).astype(jnp.int32)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1)

    return PreprocessOut(
        means2d_ndc=ndc,
        means2d_pix=pix,
        depths=p_view_z,
        conics=conics,
        radii=radii,
        rect=rect,
        tiles_touched=tiles_touched,
        mask=mask,
    )
