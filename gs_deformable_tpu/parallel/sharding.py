"""Multi-chip sharded training step over a ('data', 'model') mesh.

The reference is strictly single-GPU (SURVEY.md section 5: no distributed
backend; device pinned at general_utils.py:133).  The TPU-native scaling
design (SURVEY.md section 7.2 M6 / BASELINE.json config 5):

- **data axis** — one camera (timestep) per data replica; parameter gradients
  are averaged across replicas.  Semantics = n_data reference iterations with
  a shared parameter update.
- **model axis** — per-gaussian work (deformation MLP, activation assembly,
  EWA preprocess, SH color: the FLOPs-heavy part) is sharded over gaussian
  slices; the small per-gaussian screen-space records (~22 floats) are
  all-gathered over ICI; each shard then bins and composites only its own
  contiguous *band* of tile rows (the "primitive duplication" of the north
  star: a gaussian whose rect spans bands is binned by every band it touches).
  The image is re-assembled with a tiled all-gather; the loss is partitioned
  exactly by band rows (SSIM windows read gathered neighbor rows but each
  ssim-map row is accumulated by exactly one shard), so per-shard gradients
  psum to the exact total — XLA routes the transposes of the all-gathers as
  reduce-scatters over ICI, overlapping them with the backward band sweep.

Both collectives ride ICI; the Adam update runs replicated (identical psum'd
gradients on every device), so parameters never travel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models import deform as deform_mod
from ..models.gaussians import adam_step
from ..ops import sh as sh_ops
from ..ops.binning import aligned_capacity, bin_gaussians
from ..ops.pallas.composite import SPLAT_WIDTH, make_tile_composite
from ..ops.projection import ndc2pix, preprocess
from ..ops.transforms import build_cov3d
from ..renderer import CameraArrays
from ..training import TrainState, learning_rates
from ..utils.general import psnr


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    active_sh_degree: int,
    spatial_lr_scale: float,
    capacity: int,
    interpret: Optional[bool] = None,
):
    """Build the jitted sharded step.

    Inputs of the returned function: replicated TrainState, camera batch with
    leading dim n_data, gt images (n_data, 3, H, W), bg (3,), iteration.
    """
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    r = cfg.raster
    grid_x = (width + r.tile_x - 1) // r.tile_x
    grid_y = (height + r.tile_y - 1) // r.tile_y
    assert grid_y % n_model == 0, (
        f"tile rows {grid_y} must divide over model axis {n_model}"
    )
    assert height % r.tile_y == 0, "sharded path requires tile-aligned height"
    band_rows = grid_y // n_model
    band_px = band_rows * r.tile_y
    assert capacity % n_model == 0
    p_loc = capacity // n_model
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    comp = make_tile_composite(
        grid_x=grid_x,
        grid_y=band_rows,  # each shard composites its own band
        tile_x=r.tile_x,
        tile_y=r.tile_y,
        chunk=r.chunk,
        padded_capacity=aligned_capacity(r.instance_capacity, grid_x * band_rows, r.chunk),
        tile_batch=r.tile_batch,
        alpha_max=r.alpha_max,
        alpha_min=r.alpha_min,
        eps=r.transmittance_eps,
        interpret=interpret,
    )

    def local_forward(gparams, dparams, screen_zero, gstate, cam, gt, bg, iteration):
        """Per-device forward: gaussian slice math -> gather -> band composite.
        Returns the exactly-partitioned local loss + aux."""
        midx = jax.lax.axis_index("model")
        st = gstate.with_params(gparams)

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, midx * p_loc, p_loc, axis=0)

        xyz = sl(st.xyz)
        alive = sl(st.alive)
        a1 = alive[:, None]

        # Deformation on the local slice (renderer.deformed_attributes).
        if cfg.model.deform_mode == "offset":
            dx, d_scale, d_rot, d_shs = deform_mod.deform_offsets(
                dparams, xyz, cam.time, iteration, cfg.deform
            )
            means3d = xyz + dx
            scales = jnp.exp(sl(st.scaling) + d_scale)
            rot = sl(st.rotation) + d_rot
            rotations = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12
            )
            shs = (
                jnp.concatenate([sl(st.f_dc), sl(st.f_rest)], axis=1)
                + d_shs.reshape(p_loc, cfg.deform.sh_coeffs, 3)
            )
        elif cfg.model.deform_mode == "se3":
            means3d = deform_mod.deform_se3(dparams, xyz, cam.time, iteration, cfg.deform)
            dx = means3d - xyz
            scales = jnp.exp(sl(st.scaling))
            rotations = sl(st.rotation)
            rotations = rotations / jnp.maximum(
                jnp.linalg.norm(rotations, axis=-1, keepdims=True), 1e-12
            )
            shs = jnp.concatenate([sl(st.f_dc), sl(st.f_rest)], axis=1)
        else:
            means3d = xyz
            dx = jnp.zeros_like(xyz)
            scales = jnp.exp(sl(st.scaling))
            rotations = sl(st.rotation)
            rotations = rotations / jnp.maximum(
                jnp.linalg.norm(rotations, axis=-1, keepdims=True), 1e-12
            )
            shs = jnp.concatenate([sl(st.f_dc), sl(st.f_rest)], axis=1)
        opacity = jax.nn.sigmoid(sl(st.opacity))

        # Dead-slot gating (see renderer.py) on the local slice.
        means3d = jnp.where(a1, means3d, 1e6)
        scales = jnp.where(a1, scales, 1e-6)
        rotations = jnp.where(
            a1, rotations, jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        )
        opacity = jnp.where(a1, opacity, 0.0)
        shs = jnp.where(a1[:, :, None], shs, 0.0)
        dx = jnp.where(a1, dx, 0.0)

        cov3d = build_cov3d(scales, rotations)
        pre = preprocess(
            means3d, cov3d, cam.world_view, cam.full_proj,
            width=width, height=height, tan_fovx=tan_fovx, tan_fovy=tan_fovy,
            tile_x=r.tile_x, tile_y=r.tile_y, alive=alive,
            opacities=opacity[:, 0] if r.opacity_aware_radius else None,
        )
        colors = sh_ops.eval_sh_color(
            active_sh_degree, shs, means3d, cam.camera_center
        )

        # Gather the compact per-gaussian records over ICI: (P, 22) floats.
        gather = lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True)
        ndc = gather(pre.means2d_ndc) + screen_zero  # densify grad tap
        conics = gather(pre.conics)
        op_full = gather(opacity[:, 0])
        col_full = gather(colors)
        depth_full = gather(pre.depths)
        rect_full = gather(pre.rect)

        # Band-relative rects: clip tile rows to [band_y0, band_y0 + band_rows).
        band_y0 = midx * band_rows
        # The band composite kernel indexes pixel rows from its own origin, so
        # splat y moves into band coordinates.
        pix = jnp.stack(
            [
                ndc2pix(ndc[:, 0], width),
                ndc2pix(ndc[:, 1], height)
                - (band_y0 * r.tile_y).astype(jnp.float32),
            ],
            axis=-1,
        )
        y0 = jnp.clip(rect_full[:, 1] - band_y0, 0, band_rows)
        y1 = jnp.clip(rect_full[:, 3] - band_y0, 0, band_rows)
        rect_band = jnp.stack([rect_full[:, 0], y0, rect_full[:, 2], y1], axis=-1)
        tiles_band = (rect_full[:, 2] - rect_full[:, 0]) * (y1 - y0)

        binning = bin_gaussians(
            jax.lax.stop_gradient(tiles_band),
            jax.lax.stop_gradient(rect_band),
            jax.lax.stop_gradient(depth_full),
            grid_x=grid_x, grid_y=band_rows,
            capacity=r.instance_capacity, chunk=r.chunk,
            sort_mode=r.sort_mode,
        )
        splats = jnp.concatenate(
            [
                pix, conics, op_full[:, None], col_full,
                jnp.zeros((capacity, SPLAT_WIDTH - 9), jnp.float32),
            ],
            axis=1,
        )
        splats = jax.lax.optimization_barrier(splats)
        sorted_splats_t = jax.lax.optimization_barrier(splats[binning.gid]).T
        out_tiles = comp(
            sorted_splats_t, binning.tile_chunk_start, binning.tile_count
        )[: grid_x * band_rows]

        # Re-assemble the full image: tiled gather of band outputs.
        out_full = jax.lax.all_gather(out_tiles, "model", axis=0, tiled=True)

        def assemble(rows):
            c = rows.shape[1]
            x = rows.reshape(grid_y, grid_x, c, r.tile_y, r.tile_x)
            return x.transpose(2, 0, 3, 1, 4).reshape(
                c, grid_y * r.tile_y, grid_x * r.tile_x
            )[:, :height, :width]

        color = assemble(out_full[:, 0:3, :])
        final_t = assemble(out_full[:, 3:4, :])[0]
        image = color + final_t[None] * bg[:, None, None]

        # Exactly-partitioned loss: this shard accounts for its band's pixel
        # rows and its slice's offset norms; psum over 'model' == total loss.
        npx = 3 * height * width
        diff = jnp.abs(image - gt)
        band_slice = lambda x: jax.lax.dynamic_slice_in_dim(
            x, midx * band_px, band_px, axis=1
        )
        l1_local = jnp.sum(band_slice(diff)) / npx
        ssim_map_local = jnp.sum(band_slice(_ssim_map(image, gt))) / npx

        sq = jnp.sum(dx * dx, axis=-1)
        nz = sq > 0
        norms = jnp.sqrt(jnp.where(nz, sq, 1.0)) * nz.astype(jnp.float32)
        alive_total = jax.lax.psum(alive.sum(), "model")
        onorm_local = jnp.sum(norms * alive.astype(jnp.float32)) / jnp.maximum(
            alive_total, 1
        )

        lam = cfg.opt.lambda_dssim
        loss_local = (1.0 - lam) * (
            l1_local + cfg.opt.lambda_offset_norm * onorm_local
        ) + lam * (1.0 / n_model - ssim_map_local)

        aux = {
            "image": image,
            "radii_local": pre.radii,
            "visibility_local": pre.radii > 0,
            "required": binning.required,
        }
        return loss_local, aux

    def _ssim_map(img, gt):
        # ssim() returns the mean; recompute the map via the same filter chain.
        from ..utils.losses import _filter2d, _gaussian_window

        win = _gaussian_window(11, 1.5)
        mu1 = _filter2d(img, win)
        mu2 = _filter2d(gt, win)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = _filter2d(img * img, win) - mu1_sq
        s2 = _filter2d(gt * gt, win) - mu2_sq
        s12 = _filter2d(img * gt, win) - mu12
        c1, c2 = 0.01**2, 0.03**2
        return ((2 * mu12 + c1) * (2 * s12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
        )

    def device_fn(ts: TrainState, cam_b, gt_b, bg, iteration):
        cam = jax.tree_util.tree_map(lambda x: x[0], cam_b)
        gt = gt_b[0]
        gstate = ts.gaussians

        def loss_fn(gparams, dparams, screen_zero):
            return local_forward(
                gparams, dparams, screen_zero, gstate, cam, gt, bg, iteration
            )

        screen_zero = jnp.zeros((capacity, 2), jnp.float32)
        (loss_local, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(gstate.params(), ts.deform, screen_zero)
        g_gauss, g_deform, g_screen = grads

        # Sum over model shards first: g_screen is then the exact per-camera
        # NDC gradient (replicated within each data replica) — the stats need
        # it *per camera*, matching one reference iteration per camera.
        g_gauss, g_deform, g_screen = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "model"), (g_gauss, g_deform, g_screen)
        )
        # Parameter update uses the camera-mean.
        g_gauss, g_deform = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), (g_gauss, g_deform)
        )
        loss = jax.lax.psum(loss_local, "model")
        loss = jax.lax.pmean(loss, "data")

        # Densification stats (add_densification_stats semantics, summed over
        # the camera batch = n_data reference iterations).
        vis_full = jax.lax.all_gather(
            aux["visibility_local"], "model", axis=0, tiled=True
        )
        radii_full = jax.lax.all_gather(
            aux["radii_local"], "model", axis=0, tiled=True
        )
        gn = jnp.linalg.norm(g_screen[:, :2], axis=-1, keepdims=True)
        in_densify = iteration < cfg.opt.densify_until_iter

        def upd_stats(g):
            vis = vis_full & g.alive
            accum = g.xyz_gradient_accum + jax.lax.psum(
                jnp.where(vis[:, None], gn, 0.0), "data"
            )
            denom = g.denom + jax.lax.psum(
                vis[:, None].astype(jnp.float32), "data"
            )
            radii = jnp.where(
                vis, jnp.maximum(g.max_radii2d, radii_full.astype(jnp.float32)),
                g.max_radii2d,
            )
            radii = jax.lax.pmax(radii, "data")
            return g.replace(
                xyz_gradient_accum=accum, denom=denom, max_radii2d=radii
            )

        gstate = jax.lax.cond(in_densify, upd_stats, lambda g: g, gstate)

        params = {**gstate.params(), "offset_model": ts.deform}
        all_grads = {**g_gauss, "offset_model": g_deform}
        lrs = learning_rates(iteration, cfg, spatial_lr_scale)
        new_params, new_adam = adam_step(
            params, all_grads, ts.adam, lrs,
            b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2, eps=cfg.opt.adam_eps,
        )
        new_deform = new_params.pop("offset_model")
        gstate = gstate.with_params(new_params)

        metrics = {
            "loss": loss,
            "psnr": jax.lax.pmean(
                psnr(aux["image"][None], gt[None]).mean(), "data"
            ),
            "required_instances": jax.lax.pmax(
                jax.lax.pmax(aux["required"], "model"), "data"
            ),
            "n_alive": gstate.num_alive,
        }
        new_ts = ts.replace(gaussians=gstate, deform=new_deform, adam=new_adam)
        return new_ts, metrics

    rep = P()
    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(rep, P("data"), P("data"), rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def batch_cameras(cams) -> CameraArrays:
    """Stack host cameras into a leading data-batch dimension."""
    return CameraArrays(
        world_view=jnp.stack([jnp.asarray(c.world_view) for c in cams]),
        full_proj=jnp.stack([jnp.asarray(c.full_proj) for c in cams]),
        camera_center=jnp.stack([jnp.asarray(c.camera_center) for c in cams]),
        time=jnp.asarray([c.time for c in cams], jnp.float32),
    )
