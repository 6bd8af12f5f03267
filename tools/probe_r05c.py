"""Round-5 binning-internal decomposition at 1080p bench scale.

Cumulative cuts of the exact-mode pipeline (mirrors ops/binning.bin_gaussians
sort_mode="exact", fill_mode="pallas_all"), one compiled graph per cut, all
same-process chained:

  mask      tile_ellipse_mask alone
  front     + the (inactive, depth) P-sort + cumsum
  fills     + _prefix_fills (ids/offsets/code/mask columns)
  emit      + rank->tile_id reconstruction
  tsort     + the K tile sort
  bounds    + tile_bounds_via_sort
  relayout  + chunk_start cumsum + _delta_fills + ordered place (full)

Usage: python tools/probe_r05c.py   (plain python, on the chip)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CAP = 100_000, 131_072
ICAP, SLACK = 576 * 1024, 640 * 1024
W, H = 1920, 1080
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from bench import _scene, _camera
    from gs_deformable_tpu.config import Config, RasterizeConfig
    from gs_deformable_tpu.renderer import deformed_attributes
    from gs_deformable_tpu.ops import sh as sh_ops
    from gs_deformable_tpu.ops import binning as B
    from gs_deformable_tpu.ops.projection import (
        ndc2pix, preprocess, tile_ellipse_mask)
    from gs_deformable_tpu.ops.transforms import build_cov3d
    from gs_deformable_tpu.ops.scan_utils import cumsum_i32

    cfg = Config(raster=RasterizeConfig(
        instance_capacity=ICAP, chunk=128, aligned_slack=SLACK))
    ts, _ = _scene(N, CAP, cfg)
    cam, tanx, tany = _camera(W, H)
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    K = ICAP
    chunk = 128
    Kp = B.aligned_capacity(K, num_tiles, chunk, SLACK)
    out = {}

    @jax.jit
    def screen_arrays(gaussians, deform, c):
        means3d, scales, rotations, opacity, shs, _ = deformed_attributes(
            gaussians, deform, c.time, jnp.asarray(10_000), cfg)
        cov3d = build_cov3d(scales, rotations)
        pre = preprocess(
            means3d, cov3d, c.world_view, c.full_proj, width=W, height=H,
            tan_fovx=tanx, tan_fovy=tany, tile_x=16, tile_y=16,
            alive=gaussians.alive, opacities=opacity[:, 0])
        pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                         ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
        return (pix, pre.depths, pre.conics, opacity[:, 0],
                pre.rect, pre.tiles_touched)

    pix, depths, conics, op, rect, tt0 = jax.block_until_ready(
        screen_arrays(ts.gaussians, ts.deform, cam))
    P = pix.shape[0]

    def consume(*xs):
        # ORDER-WEIGHTED consumption: a plain sum of sort outputs is
        # permutation-invariant, which let XLA fold the bounds/full stage
        # graphs in the first round-5 run (0.03 ms readings).  Weighting by
        # position makes every consumed value order-dependent.
        tot = jnp.float32(0)
        for x in xs:
            xf = x.astype(jnp.float32)
            w = (jnp.arange(xf.shape[0], dtype=jnp.float32) % 97.0) + 1.0
            tot = tot + jnp.dot(
                w, xf if xf.ndim == 1 else xf.sum(-1),
                precision=jax.lax.Precision.DEFAULT)
        return tot

    # Stage bodies (cumulative), mirroring bin_gaussians "exact".
    def upto(stage):
        def run(d):
            tm, t = tile_ellipse_mask(pix, conics, op, rect, tt0,
                                      tile_x=16, tile_y=16)
            if stage == "mask":
                return consume(tm, t)
            t = t.astype(jnp.int32)
            ids = jnp.arange(P, dtype=jnp.int32)
            w_t = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
            # small_grid form (num_tiles 8160 < 8192 at 1080p) — match
            # bin_gaussians' production path.
            code = ((rect[:, 1] * grid_x + rect[:, 0]) << 10) | w_t
            code_bits = 23
            inactive = (t <= 0).astype(jnp.int32)
            s = jax.lax.sort((inactive, d, ids, t, code, tm),
                             num_keys=2, is_stable=True)
            ids, t, code, tmR = s[2], s[3], s[4], s[5]
            cum = cumsum_i32(t)
            offsets = cum - t
            required = cum[-1]
            if stage == "front":
                return consume(ids, offsets, required)
            vals = [ids, offsets, code, tmR]
            widths = [22, 22, code_bits, 17]
            fills = B._prefix_fills(vals, t > 0, offsets, K, widths=widths,
                                    fill_mode="pallas_all")
            safe_gid, offs, ic, imask = fills
            if stage == "fills":
                return consume(safe_gid, offs, ic, imask)
            pos = jnp.arange(K, dtype=jnp.int32)
            valid = pos < jnp.minimum(required, K)
            rank = pos - offs
            flagged = (imask >> 16) > 0
            slot = B._kth_set_bit(imask & 0xFFFF, rank)
            rank = jnp.where(flagged, slot, rank)
            iw = ic & 0x3FF
            btile = ic >> 10
            tile_id = btile + (rank // iw) * grid_x + rank % iw
            tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
            if stage == "emit":
                return consume(tile_id)
            tile_id = jax.lax.optimization_barrier(tile_id)
            tile_sorted, gid_sorted = jax.lax.sort(
                (tile_id, safe_gid), num_keys=1, is_stable=True)
            if stage == "tsort":
                return consume(tile_sorted, gid_sorted)
            bounds = B.tile_bounds_via_sort(tile_sorted, num_tiles)
            tile_start = bounds[:-1]
            tile_count = bounds[1:] - bounds[:-1]
            if stage == "bounds":
                return consume(tile_start, tile_count, gid_sorted)
            cpt = (tile_count + chunk - 1) // chunk
            chunk_start = cumsum_i32(cpt) - cpt
            start_fill, chunk_base = B._delta_fills(
                [tile_start, chunk_start], tile_count > 0, tile_start, K,
                fill_mode="pallas_all")
            rank_in_tile = pos - start_fill
            in_tile = tile_sorted < num_tiles
            new_pos = jnp.where(
                in_tile,
                jnp.minimum(chunk_base * chunk + rank_in_tile, Kp + pos),
                Kp + pos)
            new_pos, gid_s = jax.lax.optimization_barrier(
                (new_pos, gid_sorted))
            from gs_deformable_tpu.ops.pallas.ordered_fill import (
                ordered_place_i32)
            gid_aligned = ordered_place_i32(new_pos, gid_s, Kp)
            return consume(gid_aligned, chunk_start, tile_count)

        @jax.jit
        def jitted(j):
            return run(depths + j * 1e-12)

        return jitted

    for stage in ["mask", "front", "fills", "emit", "tsort", "bounds",
                  "full"]:
        fn = upto(stage)
        fn(np.float32(-1)).block_until_ready()
        t0 = time.time()
        o = None
        for i in range(REPS):
            o = fn(np.float32(i))
        jax.block_until_ready(o)
        out[stage + "_ms"] = round((time.time() - t0) / REPS * 1e3, 2)

    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
