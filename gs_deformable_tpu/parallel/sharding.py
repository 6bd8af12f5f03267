"""Multi-chip sharded training over a ('data', 'model') mesh — sharded state.

The reference is strictly single-GPU (SURVEY.md section 5: no distributed
backend; device pinned at general_utils.py:133).  The TPU-native scaling
design (SURVEY.md section 7.2 M6 / BASELINE.json config 5):

- **data axis** — one camera (timestep) per data replica; parameter gradients
  are averaged across replicas.  Semantics = n_data reference iterations with
  a shared parameter update.
- **model axis** — the gaussian state itself is SHARDED: each device owns a
  contiguous 1/n_model slice of every per-gaussian parameter, its Adam
  moments, and its densification stats (per-chip parameter memory scales as
  1/n_model).  Per-gaussian work (deformation MLP, activation assembly, EWA
  preprocess, SH color: the FLOPs-heavy part) runs on the local slice; the
  small per-gaussian screen-space records (~22 floats) are all-gathered over
  ICI; each shard then bins and composites only its own contiguous *band* of
  tile rows (the "primitive duplication" of the north star: a gaussian whose
  rect spans bands is binned by every band it touches).  The image is
  re-assembled with a tiled all-gather; the loss is partitioned exactly by
  band rows, so the VJP of the record all-gather (an ICI reduce-scatter)
  delivers each shard exactly its slice's total-loss gradients — no explicit
  model-axis psum of parameter gradients, and parameters never travel.
- Tile-row bands need NOT divide the grid: the tile grid is padded with empty
  rows to a multiple of n_model (padded tiles bin zero instances and are
  sliced off after assembly), so any n_model <= padded tile rows works.

Deformation-MLP parameters stay replicated (they are ~1e6 floats vs up to
~1e8 gaussian floats); their gradients psum over 'model' and pmean over
'data'.  Densification/opacity-reset run sharded too: each shard clones/
splits/prunes within its own capacity slice (free slots are per-shard — the
reference's global free pool at gaussian_model.py:1042-1105 is an allocator
detail, not semantics; overflow is surfaced via n_dropped).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.gaussians import (
    PARAM_GROUPS,
    adam_step,
    densify_and_prune,
    reset_opacity,
)
from ..ops import sh as sh_ops
from ..ops.projection import ndc2pix, preprocess
from ..ops.rasterize import composite_tiles
from ..ops.transforms import build_cov3d
from ..renderer import CameraArrays, deformed_attributes
from ..training import TrainState, learning_rates
from ..utils.general import psnr
from ..utils.losses import ssim_map


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def train_state_specs(ts: TrainState) -> TrainState:
    """Leaf-level PartitionSpec tree for a TrainState: per-gaussian leaves
    (the six param groups + stats + alive mask + their Adam moments) shard
    over 'model'; MLP params, latent heads, RNG key, and step stay replicated."""
    gp, rep = P("model"), P()

    def full(spec, subtree):
        return jax.tree_util.tree_map(lambda _: spec, subtree)

    def moments(tree):
        return {
            k: full(gp if k in PARAM_GROUPS else rep, v)
            for k, v in tree.items()
        }

    return TrainState(
        gaussians=full(gp, ts.gaussians),
        deform=full(rep, ts.deform),
        latent=full(rep, ts.latent),
        adam=ts.adam.replace(
            mu=moments(ts.adam.mu), nu=moments(ts.adam.nu), step=rep
        ),
        key=rep,
    )


def interleave_perm(capacity: int, n_model: int) -> np.ndarray:
    """Round-robin row relabeling: new row (shard s, slot k) <- old row
    k*n_model + s.  Spreads alive rows (contiguous after init) evenly over
    shards so every shard's densify free-slot pool stays balanced.  Row order
    is not semantic (the reference's own densify reorders rows per round,
    gaussian_model.py:1107-1127); only equal-(tile,depth) sort tiebreaks can
    reassociate, at float rounding."""
    return np.arange(capacity).reshape(-1, n_model).T.reshape(-1)


def permute_gaussian_rows(ts: TrainState, perm: np.ndarray) -> TrainState:
    """Apply a row permutation to every per-gaussian leaf (params, stats,
    alive mask, Adam moments); MLP params/latent/key untouched."""
    idx = jnp.asarray(perm)
    g = jax.tree_util.tree_map(lambda x: x[idx], ts.gaussians)

    def mom(tree):
        return {
            k: (jax.tree_util.tree_map(lambda x: x[idx], v)
                if k in PARAM_GROUPS else v)
            for k, v in tree.items()
        }

    adam = ts.adam.replace(mu=mom(ts.adam.mu), nu=mom(ts.adam.nu))
    return ts.replace(gaussians=g, adam=adam)


def shard_train_state(
    ts: TrainState, mesh: Mesh, interleave: bool = True
) -> TrainState:
    """Place a TrainState on the mesh with the model-sharded layout (per-chip
    parameter memory ∝ 1/n_model).  ``interleave`` round-robins rows across
    shards first (recommended whenever densification will run sharded)."""
    n_model = mesh.shape["model"]
    if interleave and n_model > 1:
        ts = permute_gaussian_rows(
            ts, interleave_perm(ts.gaussians.capacity, n_model)
        )
    specs = train_state_specs(ts)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(ts, shardings)


def _build_device_step(
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
    """The per-device train-step body shared by the per-step and chunked
    sharded dispatchers.  Returns ``device_fn(ts, cam_b, gt_b, bg, iteration)
    -> (ts, metrics)`` meant to run INSIDE shard_map over ('data','model')."""
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    r = cfg.raster
    grid_x = (width + r.tile_x - 1) // r.tile_x
    grid_y = (height + r.tile_y - 1) // r.tile_y
    # Pad the tile grid with empty rows so any n_model works (padded tiles
    # bin nothing; their default rows are sliced off after assembly).
    grid_y_p = -(-grid_y // n_model) * n_model
    band_rows = grid_y_p // n_model
    band_px = band_rows * r.tile_y
    assert capacity % n_model == 0
    p_loc = capacity // n_model
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def local_forward(gparams, dparams, screen_zero, gstate, latent, cam, gt,
                      bg, iteration):
        """Per-device forward on the LOCAL gaussian slice -> all-gather of
        screen records -> band composite.  Returns the exactly-partitioned
        local loss + aux; the gathers' VJPs (reduce-scatters) deliver local
        parameter gradients of the TOTAL loss.

        Built FROM the single-chip pieces (renderer.deformed_attributes +
        ops.rasterize.composite_tiles) so the sharded step inherits every
        fast-path feature — composite_mode mixed/packed, tile_cull,
        fill/scan modes, aligned_slack, opacity-mask gate — and cannot
        silently diverge from the single-chip semantics (VERDICT r3 #2)."""
        midx = jax.lax.axis_index("model")
        st = gstate.with_params(gparams)
        alive = st.alive

        # Deformation + activations + dead-slot gating: the single-chip
        # function on the local slice.
        means3d, scales, rotations, opacity2, shs, dx = deformed_attributes(
            st, dparams, cam.time, iteration, cfg, latent_heads=latent
        )
        opacity = opacity2

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

        # NDC-gradient tap on the LOCAL slice (the densify stats input),
        # applied before the gather so its gradient needs no extra collective.
        ndc_local = pre.means2d_ndc + screen_zero

        # Gather the compact per-gaussian records over ICI: (P, 22) floats.
        gather = lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True)
        ndc = gather(ndc_local)
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

        # The shared single-chip composite pipeline on this shard's band.
        out_tiles, required, required_aligned = composite_tiles(
            pix, depth_full, conics, op_full, col_full,
            rect_band, tiles_band,
            grid_x=grid_x, grid_y=band_rows, cfg=r, interpret=interpret,
        )

        # Re-assemble the full (pad-row-inclusive) image: tiled band gather.
        out_full = jax.lax.all_gather(out_tiles, "model", axis=0, tiled=True)

        def assemble(rows):
            c = rows.shape[1]
            x = rows.reshape(grid_y_p, grid_x, c, r.tile_y, r.tile_x)
            return x.transpose(2, 0, 3, 1, 4).reshape(
                c, grid_y_p * r.tile_y, grid_x * r.tile_x
            )[:, :height, :width]

        color = assemble(out_full[:, 0:3, :])
        final_t = assemble(out_full[:, 3:4, :])[0]
        image = color + final_t[None] * bg[:, None, None]

        # Exactly-partitioned loss: this shard accounts for its band's pixel
        # rows (masked — the last band may extend past the image) and its
        # slice's offset norms; psum over 'model' == total loss.
        npx = 3 * height * width
        rows_i = jnp.arange(height, dtype=jnp.int32)
        band_mask = (
            (rows_i >= midx * band_px) & (rows_i < (midx + 1) * band_px)
        ).astype(jnp.float32)[None, :, None]
        diff = jnp.abs(image - gt)
        l1_local = jnp.sum(diff * band_mask) / npx
        ssim_map_local = jnp.sum(ssim_map(image, gt) * band_mask) / npx

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
            "required": required,
            "required_aligned": required_aligned,
            "l1_local": l1_local,
            "offset_norms_local": jax.lax.stop_gradient(
                norms * alive.astype(jnp.float32)
            ),
        }
        return loss_local, aux

    def device_fn(ts: TrainState, cam_b, gt_b, bg, iteration):
        cam = jax.tree_util.tree_map(lambda x: x[0], cam_b)
        gt = gt_b[0]
        gstate = ts.gaussians  # LOCAL slice (p_loc rows per leaf)

        def loss_fn(gparams, dparams, screen_zero):
            return local_forward(
                gparams, dparams, screen_zero, gstate, ts.latent, cam, gt,
                bg, iteration
            )

        screen_zero = jnp.zeros((p_loc, 2), jnp.float32)
        (loss_local, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(gstate.params(), ts.deform, screen_zero)
        g_gauss, g_deform, g_screen = grads
        # g_gauss / g_screen are already the TOTAL-loss gradients for the
        # local slice (the record all-gathers' VJPs reduce-scatter the
        # cross-band terms).  The replicated MLP's grads still need the
        # model-axis sum; parameter updates use the camera mean.
        g_deform = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "model"), g_deform
        )
        g_gauss, g_deform = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), (g_gauss, g_deform)
        )
        loss = jax.lax.psum(loss_local, "model")
        loss = jax.lax.pmean(loss, "data")

        # Densification stats (add_densification_stats semantics, summed over
        # the camera batch = n_data reference iterations), on the local
        # slice.  Gated by masking visibility, NOT lax.cond: a conditional
        # whose operand/result is the whole GaussianState forces branch
        # copies of every leaf (~10 ms of the 800px single-chip step —
        # round-4 probe i/j; same hazard sharded), and the masked psums of
        # zeros are exactly the identity update.
        gn = jnp.linalg.norm(g_screen[:, :2], axis=-1, keepdims=True)
        in_densify = iteration < cfg.opt.densify_until_iter

        vis = aux["visibility_local"] & gstate.alive & in_densify
        accum = gstate.xyz_gradient_accum + jax.lax.psum(
            jnp.where(vis[:, None], gn, 0.0), "data"
        )
        denom = gstate.denom + jax.lax.psum(
            vis[:, None].astype(jnp.float32), "data"
        )
        radii_upd = jnp.where(
            vis,
            jnp.maximum(
                gstate.max_radii2d, aux["radii_local"].astype(jnp.float32)
            ),
            gstate.max_radii2d,
        )
        radii_upd = jax.lax.pmax(radii_upd, "data")
        gstate = gstate.replace(
            xyz_gradient_accum=accum, denom=denom, max_radii2d=radii_upd
        )
        gstate = gstate.replace(
            last_offset_norm=aux["offset_norms_local"]
        )

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
            "ll1": jax.lax.pmean(
                jax.lax.psum(aux["l1_local"], "model"), "data"
            ),
            "psnr": jax.lax.pmean(
                psnr(aux["image"][None], gt[None]).mean(), "data"
            ),
            "required_instances": jax.lax.pmax(
                jax.lax.pmax(aux["required"], "model"), "data"
            ),
            "required_aligned": jax.lax.pmax(
                jax.lax.pmax(aux["required_aligned"], "model"), "data"
            ),
            "n_alive": jax.lax.psum(gstate.num_alive, "model"),
        }
        new_ts = ts.replace(gaussians=gstate, deform=new_deform, adam=new_adam)
        return new_ts, metrics

    return device_fn


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

    Inputs of the returned function: TrainState (model-sharded or replicated —
    jit re-shards to the model-sharded layout), camera batch with leading dim
    n_data, gt images (n_data, 3, H, W), bg (3,), iteration.
    """
    device_fn = _build_device_step(
        cfg, mesh, width=width, height=height, tan_fovx=tan_fovx,
        tan_fovy=tan_fovy, active_sh_degree=active_sh_degree,
        spatial_lr_scale=spatial_lr_scale, capacity=capacity,
        interpret=interpret,
    )
    rep = P()

    def build(ts_example):
        state_specs = train_state_specs(ts_example)
        return jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(state_specs, P("data"), P("data"), rep, rep),
            out_specs=(state_specs, rep),
            check_vma=False,
        )

    jitted = {}

    def step(ts, cam_b, gt_b, bg, iteration):
        key = jax.tree_util.tree_structure(ts)
        if key not in jitted:
            jitted[key] = jax.jit(build(ts), donate_argnums=(0,))
        return jitted[key](ts, cam_b, gt_b, bg, iteration)

    return step


def make_sharded_chunk_step(
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
    chunk_max: int = 10,
    interpret: Optional[bool] = None,
):
    """Device-side multi-step dispatch for the SHARDED path.

    The single-device loop amortizes the per-dispatch host RTT over up to
    ``chunk_max`` steps (training.make_chunk_step); until round 5 the mesh
    path dispatched one step per host round-trip — on a real pod that is
    per-step host latency the single-chip path no longer pays (VERDICT r4
    missing #3).  This runs the fori loop INSIDE shard_map, so the whole
    chunk (collectives included) is one executable per chip.

    Cameras arrive stacked (chunk_max, n_data, ...); gts
    (chunk_max, n_data, 3, H, W); ``n`` is the dynamic trip count.  Metrics
    mirror training.make_chunk_step: last-step values plus chunk-accumulated
    max instance demand and overflowing-frame count.
    """
    device_fn = _build_device_step(
        cfg, mesh, width=width, height=height, tan_fovx=tan_fovx,
        tan_fovy=tan_fovy, active_sh_degree=active_sh_degree,
        spatial_lr_scale=spatial_lr_scale, capacity=capacity,
        interpret=interpret,
    )
    from ..ops.binning import aligned_capacity

    n_model = mesh.shape["model"]
    r = cfg.raster
    grid_x = (width + r.tile_x - 1) // r.tile_x
    grid_y = (height + r.tile_y - 1) // r.tile_y
    band_rows = (-(-grid_y // n_model) * n_model) // n_model
    kp = aligned_capacity(
        r.instance_capacity, grid_x * band_rows, r.chunk, r.aligned_slack
    )
    cap = r.instance_capacity
    f32_keys = ("loss", "ll1", "psnr")
    i32_keys = ("required_instances", "required_aligned", "n_alive")

    def chunk_device_fn(ts, cams, gts, bg, it0, n):
        init = {k: jnp.float32(0) for k in f32_keys}
        init.update({k: jnp.int32(0) for k in i32_keys})
        init.update(req_max=jnp.int32(0), req_al_max=jnp.int32(0),
                    overflow_frames=jnp.int32(0))

        def body(i, carry):
            t, prev = carry
            cam_i = jax.tree_util.tree_map(lambda x: x[i], cams)
            new_t, m = device_fn(t, cam_i, gts[i], bg, it0 + i)
            over = jnp.logical_or(
                m["required_instances"] > cap, m["required_aligned"] > kp
            ).astype(jnp.int32)
            mx = {k: m[k] for k in f32_keys}
            mx.update({k: m[k] for k in i32_keys})
            mx.update(
                req_max=jnp.maximum(prev["req_max"], m["required_instances"]),
                req_al_max=jnp.maximum(prev["req_al_max"],
                                       m["required_aligned"]),
                overflow_frames=prev["overflow_frames"] + over,
            )
            return new_t, mx

        ts, mx = jax.lax.fori_loop(0, n, body, (ts, init))
        metrics = {k: mx[k] for k in f32_keys + i32_keys}
        metrics["required_instances"] = mx["req_max"]
        metrics["required_aligned"] = mx["req_al_max"]
        metrics["overflow_frames"] = mx["overflow_frames"]
        return ts, metrics

    rep = P()

    def build(ts_example):
        state_specs = train_state_specs(ts_example)
        return jax.shard_map(
            chunk_device_fn,
            mesh=mesh,
            in_specs=(state_specs, P(None, "data"), P(None, "data"),
                      rep, rep, rep),
            out_specs=(state_specs, rep),
            check_vma=False,
        )

    jitted = {}

    def run(ts, cams, gts, bg, it0, n):
        key = jax.tree_util.tree_structure(ts)
        if key not in jitted:
            jitted[key] = jax.jit(build(ts), donate_argnums=(0,))
        return jitted[key](ts, cams, gts, bg, it0, n)

    return run


def make_sharded_densify_step(
    cfg: Config, mesh: Mesh, extent: float, use_screen_prune: bool
):
    """Sharded densify_and_prune: every shard clones/splits/prunes within its
    own capacity slice (free-slot pool is per-shard; overflow surfaces via
    n_dropped).  Matches training.make_densify_step semantics per slice."""

    def device_fn(ts: TrainState, grad_threshold, min_opacity):
        midx = jax.lax.axis_index("model")
        key, sub = jax.random.split(ts.key)
        sub = jax.random.fold_in(sub, midx)
        mu = {k: ts.adam.mu[k] for k in PARAM_GROUPS}
        nu = {k: ts.adam.nu[k] for k in PARAM_GROUPS}
        offset_mask = None
        if cfg.opt.densify_offset_gate > 0.0:
            offset_mask = (
                ts.gaussians.last_offset_norm >= cfg.opt.densify_offset_gate
            )
        gstate, mu, nu, info = densify_and_prune(
            ts.gaussians, mu, nu, sub,
            grad_threshold=grad_threshold,
            min_opacity=min_opacity,
            extent=extent,
            percent_dense=cfg.opt.percent_dense,
            use_screen_prune=use_screen_prune,
            max_screen_size=float(cfg.opt.max_screen_size),
            offset_mask=offset_mask,
        )
        adam = ts.adam.replace(
            mu={**ts.adam.mu, **mu}, nu={**ts.adam.nu, **nu}
        )
        info_d = {
            k: jax.lax.psum(v, "model") for k, v in info._asdict().items()
        }
        return ts.replace(gaussians=gstate, adam=adam, key=key), info_d

    jitted = {}

    def run(ts, grad_threshold, min_opacity):
        key = jax.tree_util.tree_structure(ts)
        if key not in jitted:
            state_specs = train_state_specs(ts)
            fn = jax.shard_map(
                device_fn,
                mesh=mesh,
                in_specs=(state_specs, P(), P()),
                out_specs=(state_specs, P()),
                check_vma=False,
            )
            jitted[key] = jax.jit(fn, donate_argnums=(0,))
        return jitted[key](ts, grad_threshold, min_opacity)

    return run


def make_sharded_opacity_reset(cfg: Config, mesh: Mesh):
    """reset_opacity is elementwise over gaussian rows — it runs on sharded
    state under plain jit (XLA keeps the model-axis layout)."""
    del mesh

    def run(ts: TrainState):
        mu = {k: ts.adam.mu[k] for k in PARAM_GROUPS}
        nu = {k: ts.adam.nu[k] for k in PARAM_GROUPS}
        gstate, mu, nu = reset_opacity(ts.gaussians, mu, nu)
        adam = ts.adam.replace(mu={**ts.adam.mu, **mu}, nu={**ts.adam.nu, **nu})
        return ts.replace(gaussians=gstate, adam=adam)

    return jax.jit(run, donate_argnums=(0,))


def batch_cameras(cams) -> CameraArrays:
    """Stack host cameras into a leading data-batch dimension."""
    return CameraArrays(
        world_view=jnp.stack([jnp.asarray(c.world_view) for c in cams]),
        full_proj=jnp.stack([jnp.asarray(c.full_proj) for c in cams]),
        camera_center=jnp.stack([jnp.asarray(c.camera_center) for c in cams]),
        time=jnp.asarray([c.time for c in cams], jnp.float32),
    )
