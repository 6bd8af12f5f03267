"""Second, independent compositing oracle — NumPy, written from the paper's
per-pixel front-to-back alpha blending and a fresh reading of the CUDA
semantics (forward.cu:261-374 forward walk, backward.cu:401-560 back-to-front
gradient walk).  It shares NO code or structure with ops/rasterize_dense.py
(jnp scan over gaussians) — the point is de-correlating transcription errors
in the primary parity anchor (VERDICT round 1, item 5).

Semantics implemented independently here:
- instances visit a pixel only when the pixel's tile lies in their tile rect,
  in (depth, emission-order)-stable order;
- alpha = min(0.99, op * exp(power)), power = -(A dx^2 + C dy^2)/2 - B dx dy,
  skipped when power > 0 or alpha < 1/255;
- a non-skipped instance with T*(1-alpha) < 1e-4 terminates the pixel WITHOUT
  contributing; otherwise C += color * alpha * T and T *= (1-alpha);
- n_contrib is the 1-based position IN THE PIXEL'S TILE LIST of the last
  contributing instance;
- backward: walk contributors back-to-front per pixel, recovering T in front
  of each instance by division, and the suffix color recursion
  accum_c <- last_alpha*last_color_c + (1-last_alpha)*accum_c; the 0.99 alpha
  clamp is straight-through for gradients (backward.cu:500-505).

Vectorized over pixels (the sequential dependency is over instances), all
arithmetic in float32 in the same per-instance order as the sequential CUDA
loops, so forward results match bit-for-bit.
"""

from __future__ import annotations

import numpy as np

ALPHA_MAX = np.float32(0.99)
ALPHA_MIN = np.float32(1.0 / 255.0)
T_EPS = np.float32(1e-4)


def _pixel_tiles(width, height, tile_x, tile_y):
    px, py = np.meshgrid(np.arange(width), np.arange(height))
    return px.astype(np.float32), py.astype(np.float32), px // tile_x, py // tile_y


def _instance_fields(means2d, conics, opacities, colors, rect, mask, depths):
    order = np.argsort(depths, kind="stable")
    order = order[mask[order]]
    return order


def composite_forward_np(
    means2d, depths, conics, opacities, colors, rect, mask, bg,
    *, width, height, tile_x=16, tile_y=16,
):
    """Returns (image (3,H,W) incl. bg, final_T (H,W), n_contrib (H,W) i32)."""
    pxf, pyf, ptx, pty = _pixel_tiles(width, height, tile_x, tile_y)
    order = _instance_fields(means2d, conics, opacities, colors, rect, mask,
                             depths)

    T = np.ones((height, width), np.float32)
    C = np.zeros((3, height, width), np.float32)
    done = np.zeros((height, width), bool)
    counter = np.zeros((height, width), np.int32)
    last = np.zeros((height, width), np.int32)

    for g in order:
        in_tile = (
            (ptx >= rect[g, 0]) & (ptx < rect[g, 2])
            & (pty >= rect[g, 1]) & (pty < rect[g, 3])
        )
        active = in_tile & ~done
        if not active.any():
            continue
        counter = np.where(active, counter + 1, counter)
        dx = np.float32(means2d[g, 0]) - pxf
        dy = np.float32(means2d[g, 1]) - pyf
        A, B, Cc = (np.float32(conics[g, 0]), np.float32(conics[g, 1]),
                    np.float32(conics[g, 2]))
        power = (np.float32(-0.5) * (A * dx * dx + Cc * dy * dy)
                 - B * dx * dy).astype(np.float32)
        alpha = np.minimum(ALPHA_MAX,
                           np.float32(opacities[g]) * np.exp(power))
        ok = active & (power <= 0.0) & (alpha >= ALPHA_MIN)
        test_t = (T * (np.float32(1.0) - alpha)).astype(np.float32)
        terminating = ok & (test_t < T_EPS)
        contributing = ok & ~terminating
        for c in range(3):
            C[c] = np.where(
                contributing,
                C[c] + np.float32(colors[g, c]) * alpha * T, C[c],
            ).astype(np.float32)
        T = np.where(contributing, test_t, T).astype(np.float32)
        last = np.where(contributing, counter, last)
        done = done | terminating

    image = (C + T[None] * np.asarray(bg, np.float32)[:, None, None]).astype(
        np.float32)
    return image, T, last


def composite_backward_np(
    means2d, depths, conics, opacities, colors, rect, mask, g_color, g_t,
    *, width, height, tile_x=16, tile_y=16,
):
    """Analytic gradients w.r.t. (means2d, conics, opacities, colors) for the
    loss sum(g_color * color_no_bg) + sum(g_t * final_T).  Back-to-front walk
    per backward.cu:401-560; the bg term there is the special case
    g_t = bg . g_color of compositing image = C + T*bg outside."""
    pxf, pyf, ptx, pty = _pixel_tiles(width, height, tile_x, tile_y)
    order = _instance_fields(means2d, conics, opacities, colors, rect, mask,
                             depths)

    # Forward prepass for final T and each pixel's termination point.
    _, T_final, _ = composite_forward_np(
        means2d, depths, conics, opacities, colors, rect, mask,
        np.zeros(3, np.float32), width=width, height=height,
        tile_x=tile_x, tile_y=tile_y,
    )
    # Recompute the contribution mask per instance (front-to-back), to know
    # which (pixel, instance) pairs contributed.
    contrib_masks = []
    T = np.ones((height, width), np.float32)
    done = np.zeros((height, width), bool)
    for g in order:
        in_tile = (
            (ptx >= rect[g, 0]) & (ptx < rect[g, 2])
            & (pty >= rect[g, 1]) & (pty < rect[g, 3])
        )
        active = in_tile & ~done
        dx = np.float32(means2d[g, 0]) - pxf
        dy = np.float32(means2d[g, 1]) - pyf
        A, B, Cc = (np.float32(conics[g, 0]), np.float32(conics[g, 1]),
                    np.float32(conics[g, 2]))
        power = (np.float32(-0.5) * (A * dx * dx + Cc * dy * dy)
                 - B * dx * dy).astype(np.float32)
        alpha = np.minimum(ALPHA_MAX,
                           np.float32(opacities[g]) * np.exp(power))
        ok = active & (power <= 0.0) & (alpha >= ALPHA_MIN)
        test_t = (T * (np.float32(1.0) - alpha)).astype(np.float32)
        terminating = ok & (test_t < T_EPS)
        contributing = ok & ~terminating
        contrib_masks.append(contributing)
        T = np.where(contributing, test_t, T).astype(np.float32)
        done = done | terminating

    g_means2d = np.zeros_like(means2d, np.float32)
    g_conics = np.zeros_like(conics, np.float32)
    g_op = np.zeros(opacities.shape[0], np.float32)
    g_cols = np.zeros_like(colors, np.float32)

    gc = np.asarray(g_color, np.float32)
    gt = np.asarray(g_t, np.float32)

    T = T_final.copy()
    accum = np.zeros((3, height, width), np.float32)
    last_alpha = np.zeros((height, width), np.float32)
    last_color = np.zeros((3, height, width), np.float32)

    for g, contributing in zip(order[::-1], contrib_masks[::-1]):
        if not contributing.any():
            continue
        dx = np.float32(means2d[g, 0]) - pxf
        dy = np.float32(means2d[g, 1]) - pyf
        A, B, Cc = (np.float32(conics[g, 0]), np.float32(conics[g, 1]),
                    np.float32(conics[g, 2]))
        power = (np.float32(-0.5) * (A * dx * dx + Cc * dy * dy)
                 - B * dx * dy).astype(np.float32)
        G = np.exp(power).astype(np.float32)
        alpha = np.minimum(ALPHA_MAX, np.float32(opacities[g]) * G)
        m = contributing

        # T in front of this instance (it contributed, so 1-alpha > 0).
        T = np.where(m, T / (np.float32(1.0) - alpha), T).astype(np.float32)

        dL_dalpha = np.zeros((height, width), np.float32)
        for c in range(3):
            accum[c] = np.where(
                m, last_alpha * last_color[c]
                + (np.float32(1.0) - last_alpha) * accum[c], accum[c],
            ).astype(np.float32)
            g_cols[g, c] += float(np.sum(alpha[m] * T[m] * gc[c][m],
                                         dtype=np.float64))
            dL_dalpha += np.where(
                m, (np.float32(colors[g, c]) - accum[c]) * gc[c], 0.0
            ).astype(np.float32)
        dL_dalpha = (dL_dalpha * T).astype(np.float32)
        # final-T cotangent: T_final = prod(1-alpha_i) over contributors, so
        # dT_final/dalpha_i = -T_final/(1-alpha_i).
        dL_dalpha += np.where(
            m, -T_final / (np.float32(1.0) - alpha) * gt, 0.0
        ).astype(np.float32)
        dL_dalpha = np.where(m, dL_dalpha, 0.0)

        last_alpha = np.where(m, alpha, last_alpha).astype(np.float32)
        for c in range(3):
            last_color[c] = np.where(m, np.float32(colors[g, c]),
                                     last_color[c])

        # alpha = min(0.99, op*G): straight-through through the clamp.
        dL_dG = dL_dalpha * np.float32(opacities[g])
        dL_dop = dL_dalpha * G
        dL_dpower = dL_dG * G
        g_op[g] += float(np.sum(dL_dop[m], dtype=np.float64))
        g_means2d[g, 0] += float(
            np.sum((dL_dpower * (-(A * dx + B * dy)))[m], dtype=np.float64))
        g_means2d[g, 1] += float(
            np.sum((dL_dpower * (-(Cc * dy + B * dx)))[m], dtype=np.float64))
        g_conics[g, 0] += float(
            np.sum((dL_dpower * (np.float32(-0.5) * dx * dx))[m],
                   dtype=np.float64))
        g_conics[g, 1] += float(
            np.sum((dL_dpower * (-dx * dy))[m], dtype=np.float64))
        g_conics[g, 2] += float(
            np.sum((dL_dpower * (np.float32(-0.5) * dy * dy))[m],
                   dtype=np.float64))

    return g_means2d, g_conics, g_op, g_cols
