"""The differentiable tiled rasterizer: preprocess -> binning -> Pallas composite.

This is the TPU-native equivalent of the reference's full rasterization stack
(diff_gaussian_rasterization/__init__.py:44-220 + the CUDA pipeline behind it),
as ONE jit-able differentiable function.  Structure:

- `preprocess` (ops/projection.py) and SH color eval (ops/sh.py) are plain
  differentiable jnp — autodiff provides the analytic preprocess backward of
  backward.cu:144-396.
- `bin_gaussians` (ops/binning.py) is non-differentiable bookkeeping.
- The Pallas tile composite (ops/pallas/composite.py) carries a custom_vjp;
  its per-instance gradient rows flow back through the XLA gather transpose
  (scatter-add == sorted segment sum) onto per-gaussian screen-space params,
  then on through autodiff to 3D parameters.

Gradient tap: `render_gaussians` takes `means2d_offset_ndc` — a zeros (P, 2)
array added to the NDC means.  Its gradient is dL/d(ndc mean2D), the quantity
the reference taps via the retain_grad screenspace tensor
(gaussian_renderer/__init__.py:27-32) and consumes for densification
(gaussian_model.py:1252-1257), including the 0.5*W / 0.5*H pixel-Jacobian
convention of backward.cu:460-461.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import RasterizeConfig
from . import sh as sh_ops
from .binning import aligned_capacity, bin_gaussians
from .pallas.composite import SPLAT_WIDTH, make_tile_composite
from .segsum import gather_splats_t
from .projection import ndc2pix, preprocess, tile_ellipse_mask
from .transforms import build_cov3d


class RenderOut(NamedTuple):
    image: jnp.ndarray  # (3, H, W) composited over bg
    final_t: jnp.ndarray  # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32
    radii: jnp.ndarray  # (P,) int32
    means2d_ndc: jnp.ndarray  # (P, 2) — for densification stats via vjp
    visibility: jnp.ndarray  # (P,) bool (radii > 0)
    required_instances: jnp.ndarray  # () int32: needed capacity (overflow if > K)
    required_aligned: jnp.ndarray  # () int32: aligned rows needed (vs static Kp)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def composite_tiles(
    means2d_pix: jnp.ndarray,
    depths: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    rect: jnp.ndarray,
    tiles_touched: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    interpret: Optional[bool] = None,
):
    """Tile-cull -> bin -> sorted-splat gather -> Pallas composite, for an
    arbitrary (grid_x, grid_y) tile grid (differentiable).

    The single source of truth for the composite pipeline: the single-chip
    ``rasterize_arrays`` runs it on the full image grid; the band-sharded
    step (parallel/sharding.py) runs it per model shard on its band's rows
    with band-relative ``means2d_pix``/``rect`` — so every schedule
    (mixed/packed/stream/batch), tile_cull, fill/scan modes, and
    aligned_slack budgets apply identically on both paths (VERDICT r3 #2).

    Returns (out_tiles (grid_x*grid_y, 5, tile_px), required int32,
    total_aligned int32).
    """
    if interpret is None:
        interpret = _use_interpret()

    tt = jax.lax.stop_gradient(tiles_touched)
    rect_sg = jax.lax.stop_gradient(rect)
    tile_mask = None
    if cfg.tile_cull:
        tile_mask, tt = tile_ellipse_mask(
            means2d_pix, conics, opacities, rect_sg, tt,
            tile_x=cfg.tile_x, tile_y=cfg.tile_y,
        )

    # The packed schedule aligns tiles to sub_chunk rows (the DMA chunk stays
    # cfg.chunk inside the kernel); every other schedule needs full-chunk
    # tile alignment for its per-tile DMA slices.
    layout_unit = (
        cfg.sub_chunk if cfg.composite_mode == "packed" else cfg.chunk
    )
    binning = bin_gaussians(
        tt,
        rect_sg,
        jax.lax.stop_gradient(depths),
        grid_x=grid_x,
        grid_y=grid_y,
        capacity=cfg.instance_capacity,
        chunk=layout_unit,
        sort_mode=cfg.sort_mode,
        aligned_slack=cfg.aligned_slack,
        tile_mask=tile_mask,
        fill_mode=cfg.fill_mode,
    )

    P = means2d_pix.shape[0]
    splats = jnp.concatenate(
        [
            means2d_pix,
            conics,
            opacities[:, None] if opacities.ndim == 1 else opacities,
            colors,
            jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32),
        ],
        axis=1,
    )
    # Field-major sorted layout; the VJP is the per-gaussian segment-sum of
    # the backward's per-instance gradient rows (cfg.grad_reduce selects
    # XLA's scatter-ADD or the sort-based reduction in ops/segsum.py).
    sorted_splats_t = gather_splats_t(splats, binning.gid, cfg.grad_reduce)

    Kp = aligned_capacity(
        cfg.instance_capacity, grid_x * grid_y, layout_unit, cfg.aligned_slack
    )
    common = dict(
        grid_x=grid_x,
        grid_y=grid_y,
        tile_x=cfg.tile_x,
        tile_y=cfg.tile_y,
        chunk=cfg.chunk,
        padded_capacity=Kp,
        alpha_max=cfg.alpha_max,
        alpha_min=cfg.alpha_min,
        eps=cfg.transmittance_eps,
        scan_mode=cfg.scan_mode,
        interpret=interpret,
    )
    if cfg.composite_mode == "packed":
        from .pallas.packed_composite import make_packed_composite

        # The packed schedule implements the log scan only; its segmented
        # prefix rides the same tril matmul the log scan uses.
        comp = make_packed_composite(
            sub=cfg.sub_chunk, stream_chunks=cfg.stream_chunks,
            **{**common, "scan_mode": "log"}
        )
    elif cfg.composite_mode == "stream":
        from .pallas.stream_composite import make_stream_composite

        comp = make_stream_composite(stream_chunks=cfg.stream_chunks, **common)
    elif cfg.composite_mode == "mixed":
        from .pallas.stream_composite import make_mixed_composite

        comp = make_mixed_composite(
            tile_batch=cfg.tile_batch, stream_chunks=cfg.stream_chunks,
            defer_reductions=cfg.defer_fwd_reductions, **common
        )
    else:
        comp = make_tile_composite(
            tile_batch=cfg.tile_batch,
            defer_reductions=cfg.defer_fwd_reductions, **common)
    out_tiles = comp(
        sorted_splats_t, binning.tile_chunk_start, binning.tile_count
    )[: grid_x * grid_y]
    return out_tiles, binning.required, binning.total_aligned


def rasterize_arrays(
    means2d_pix: jnp.ndarray,
    depths: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    rect: jnp.ndarray,
    tiles_touched: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    interpret: Optional[bool] = None,
):
    """Composite screen-space gaussians to an image (differentiable).

    Returns (image (3,H,W), final_t (H,W), n_contrib (H,W), required int32,
    total_aligned int32).  Overflow: required > cfg.instance_capacity means
    instances were dropped from emission order; total_aligned > the static
    aligned capacity means the padding slack was exceeded (cfg.aligned_slack).
    """
    grid_x = (width + cfg.tile_x - 1) // cfg.tile_x
    grid_y = (height + cfg.tile_y - 1) // cfg.tile_y
    out_tiles, required, total_aligned = composite_tiles(
        means2d_pix, depths, conics, opacities, colors, rect, tiles_touched,
        grid_x=grid_x, grid_y=grid_y, cfg=cfg, interpret=interpret,
    )

    def assemble(rows):
        # (T, r, npix) -> (r, H, W)
        r = rows.shape[1]
        x = rows.reshape(grid_y, grid_x, r, cfg.tile_y, cfg.tile_x)
        x = x.transpose(2, 0, 3, 1, 4).reshape(
            r, grid_y * cfg.tile_y, grid_x * cfg.tile_x
        )
        return x[:, :height, :width]

    # One fused tile->image relayout for all five channels (the transpose is
    # a real data movement; three separate assembles measured ~1.3ms each).
    planes = assemble(out_tiles[:, 0:5, :])
    color = planes[0:3]
    final_t = planes[3]
    n_contrib = jax.lax.stop_gradient(planes[4]).astype(jnp.int32)
    image = color + final_t[None] * bg[:, None, None]
    return image, final_t, n_contrib, required, total_aligned


def render_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    *,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    sh_degree: int,
    scale_modifier: float = 1.0,
    alive: Optional[jnp.ndarray] = None,
    means2d_offset_ndc: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    cfg: RasterizeConfig = RasterizeConfig(),
    interpret: Optional[bool] = None,
) -> RenderOut:
    """Full differentiable render from activated 3D gaussian parameters.

    Mirrors the active path of gaussian_renderer/__init__.py:20-195 minus the
    deformation (applied by the caller to `means3d`/`scales`/... beforehand):
    activations -> cov3D -> EWA preprocess -> SH color -> tiled composite.
    `colors_precomp` / `cov3d_precomp` reproduce the convert_SHs_python /
    compute_cov3D_python pipeline switches (arguments/__init__.py:64-69).
    """
    cov3d = cov3d_precomp if cov3d_precomp is not None else build_cov3d(
        scales, rotations, scale_modifier
    )
    pre = preprocess(
        means3d,
        cov3d,
        viewmatrix,
        projmatrix,
        width=width,
        height=height,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        tile_x=cfg.tile_x,
        tile_y=cfg.tile_y,
        alive=alive,
        opacities=opacities if cfg.opacity_aware_radius else None,
    )
    ndc = pre.means2d_ndc
    if means2d_offset_ndc is not None:
        ndc = ndc + means2d_offset_ndc
    pix = jnp.stack(
        [ndc2pix(ndc[:, 0], width), ndc2pix(ndc[:, 1], height)], axis=-1
    )
    colors = colors_precomp if colors_precomp is not None else sh_ops.eval_sh_color(
        sh_degree, shs, means3d, campos
    )
    op = opacities[:, 0] if opacities.ndim == 2 else opacities
    image, final_t, n_contrib, required, total_aligned = rasterize_arrays(
        pix,
        pre.depths,
        pre.conics,
        op,
        colors,
        pre.rect,
        pre.tiles_touched,
        bg,
        width=width,
        height=height,
        cfg=cfg,
        interpret=interpret,
    )
    return RenderOut(
        image=image,
        final_t=final_t,
        n_contrib=n_contrib,
        radii=pre.radii,
        means2d_ndc=ndc,
        visibility=pre.radii > 0,
        required_instances=required,
        required_aligned=total_aligned,
    )
