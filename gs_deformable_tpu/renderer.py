"""Render orchestration: deformation + activations + tiled rasterizer.

The TPU analog of /root/reference/gaussian_renderer/__init__.py:20-195, as a
pure function over (GaussianState, deformation params, camera arrays).  The
active reference path is reproduced exactly:

- per-frame time broadcast to all gaussians (:63-66)
- offset deformation: means3D + dx; scales = exp(_scaling + dx_scale) (:116);
  rotations = normalize(_rotation + dx_rot) (:122); shs = features +
  mlp_shs.reshape(-1, 16, 3) (:140); opacity = sigmoid(_opacity) (:99)
- the SE(3) variant applies the exp-map transform to means only (the consumer
  path commented at :91-95)
- the latent opacity-mask gate (:101-103) is available behind config
- returns the same observables (render, radii, visibility, means3D/means3D_ori,
  offsets) plus the NDC-gradient tap for densification stats
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import Config
from .models import deform as deform_mod
from .models.gaussians import GaussianState
from .ops.rasterize import RenderOut, render_gaussians


class CameraArrays(NamedTuple):
    """Device-side camera parameters (from data.cameras.Camera)."""

    world_view: jnp.ndarray  # (4, 4)
    full_proj: jnp.ndarray  # (4, 4)
    camera_center: jnp.ndarray  # (3,)
    time: jnp.ndarray  # ()


def deformed_attributes(
    state: GaussianState,
    deform_params,
    time: jnp.ndarray,
    iteration: jnp.ndarray,
    cfg: Config,
    latent_heads=None,
):
    """Apply the configured deformation; returns the activated per-gaussian
    attributes plus the raw offsets (for the offset-norm loss, train.py:329-332)."""
    xyz = state.xyz
    n = xyz.shape[0]
    cd = cfg.deform.compute_dtype
    if cd == "bfloat16":
        compute_dtype = (
            "bfloat16_bwd" if cfg.deform.bf16_cotangents else jnp.bfloat16
        )
    else:
        compute_dtype = "float32_3x" if cd == "float32_3x" else None
    mode = cfg.model.deform_mode
    if mode == "offset":
        assert cfg.deform.sh_coeffs == (cfg.model.sh_degree + 1) ** 2, (
            "deform.sh_coeffs must match the SH feature count "
            f"({cfg.deform.sh_coeffs} vs (sh_degree+1)^2 = "
            f"{(cfg.model.sh_degree + 1) ** 2})"
        )
        dx, d_scale, d_rot, d_shs = deform_mod.deform_offsets(
            deform_params, xyz, time, iteration, cfg.deform,
            compute_dtype=compute_dtype,
        )
        means3d = xyz + dx
        scales = jnp.exp(state.scaling + d_scale)
        rot = state.rotation + d_rot
        rotations = rot / jnp.maximum(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12
        )
        shs = state.get_features() + d_shs.reshape(n, cfg.deform.sh_coeffs, 3)
    elif mode == "se3":
        means3d = deform_mod.deform_se3(
            deform_params, xyz, time, iteration, cfg.deform,
            compute_dtype=compute_dtype,
        )
        dx = means3d - xyz
        scales = jnp.exp(state.scaling)
        rotations = state.get_rotation()
        shs = state.get_features()
    elif mode == "none":
        means3d = xyz
        dx = jnp.zeros_like(xyz)
        scales = jnp.exp(state.scaling)
        rotations = state.get_rotation()
        shs = state.get_features()
    else:
        raise ValueError(f"unknown deform_mode {mode}")

    opacity = jax.nn.sigmoid(state.opacity)
    if cfg.model.use_opacity_mask and latent_heads is not None:
        opacity = opacity * deform_mod.opacity_mask_gate(
            latent_heads, xyz, time, iteration, cfg.deform
        )

    # Dead capacity slots must be numerically inert: their padded params can
    # produce NaN forward values (e.g. 0/0 view directions in SH eval), and a
    # NaN reached by ANY backward path — even one whose cotangent is zero —
    # poisons the shared deformation-MLP gradients (0 * NaN = NaN).  where()
    # routes dead slots to finite constants AND zeroes their gradients.  The
    # reference has no dead slots, so alive rows are untouched (parity).
    a1 = state.alive[:, None]
    means3d = jnp.where(a1, means3d, 1e6)
    scales = jnp.where(a1, scales, 1e-6)
    rotations = jnp.where(
        a1, rotations, jnp.asarray([1.0, 0.0, 0.0, 0.0], rotations.dtype)
    )
    opacity = jnp.where(a1, opacity, 0.0)
    shs = jnp.where(a1[:, :, None], shs, 0.0)
    dx = jnp.where(a1, dx, 0.0)
    return means3d, scales, rotations, opacity, shs, dx


def render(
    state: GaussianState,
    deform_params,
    camera: CameraArrays,
    *,
    iteration: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    active_sh_degree: int,
    cfg: Config,
    scale_modifier: float = 1.0,
    means2d_offset_ndc: Optional[jnp.ndarray] = None,
    latent_heads=None,
    interpret: Optional[bool] = None,
) -> tuple[RenderOut, jnp.ndarray]:
    """Full differentiable render; returns (RenderOut, dx offsets)."""
    means3d, scales, rotations, opacity, shs, dx = deformed_attributes(
        state, deform_params, camera.time, iteration, cfg, latent_heads
    )
    # Pipeline switches (PipelineParams, arguments/__init__.py:64-69): the
    # reference moves SH->RGB / cov3D out of the CUDA kernel into torch
    # (gaussian_renderer/__init__.py:111-135).  Here both paths are the same
    # JAX formulas, so the switches exercise the rasterizer's precomp inputs.
    colors_precomp = None
    cov3d_precomp = None
    if cfg.pipeline.convert_shs_python:
        from .ops import sh as sh_ops

        colors_precomp = sh_ops.eval_sh_color(
            active_sh_degree, shs, means3d, camera.camera_center
        )
    if cfg.pipeline.compute_cov3d_python:
        from .ops.transforms import build_cov3d

        cov3d_precomp = build_cov3d(scales, rotations, scale_modifier)
    out = render_gaussians(
        means3d,
        scales,
        rotations,
        opacity,
        shs,
        viewmatrix=camera.world_view,
        projmatrix=camera.full_proj,
        campos=camera.camera_center,
        bg=bg,
        width=width,
        height=height,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        sh_degree=active_sh_degree,
        scale_modifier=scale_modifier,
        alive=state.alive,
        means2d_offset_ndc=means2d_offset_ndc,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        cfg=cfg.raster,
        interpret=interpret,
    )
    return out, dx
