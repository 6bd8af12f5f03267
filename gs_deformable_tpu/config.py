"""Typed configuration for the whole framework.

The reference scatters its configuration over three reflection-based CLI groups
(``/root/reference/arguments/__init__.py:47-89``) plus many hard-coded constants
(offset-reg weight at train.py:332, deformation warmup at gaussian_model.py:308,
offset LR schedule at gaussian_model.py:862-864, min_opacity at train.py:620,
random-init point count at dataset_readers.py:292).  Here every knob lives in one
typed, immutable config tree so jitted functions can close over static values.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Scene-model options (reference: ModelParams, arguments/__init__.py:47-62)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    # Deformation network selection. "offset" = the active 4-head additive net
    # (reference DirectTemporalNeRF, gaussian_model.py:242-316). "se3" = the
    # latent SE(3) exponential-map variant (gaussian_model.py:99-173, consumer
    # commented at gaussian_renderer/__init__.py:91-95). "none" = static scene.
    deform_mode: str = "offset"
    # Latent per-head nets the reference instantiates but does not train
    # (gaussian_model.py:680-684); exposed as options.
    use_opacity_mask: bool = False
    # Random point-cloud init count (reference hard-codes 100_000 at
    # dataset_readers.py:292,577,762).
    random_init_points: int = 100_000


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    """DirectTemporalNeRF hyperparameters (gaussian_model.py:242-316)."""

    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    multires_xyz: int = 10  # posenc octaves for xyz (gaussian_model.py:248)
    multires_time: int = 10  # posenc octaves for t (gaussian_model.py:249)
    warmup_iters: int = 3000  # static warmup gate (gaussian_model.py:308)
    sh_coeffs: int = 16  # SH head emits 16*3 = 48 values (gaussian_model.py:277)
    # MLP matmul precision tier.  "bfloat16" (default) runs the matmuls on
    # the MXU in bf16 with fp32 accumulation (weights stay fp32);
    # "float32_3x" = Precision.HIGH (3 bf16 passes, ~1e-6 relative);
    # "float32" = Precision.HIGHEST, the reference-faithful fp32 tier.
    # Measured on v5e (tools/profile_r5): the tiers train to PSNR@300 of
    # 44.1 / 41.8 / 42.7 on the synthetic deformable target (bf16 is not a
    # quality loss — the MLP is a trained component, not a parity surface),
    # while the per-frame MLP cost is 2.5 / 5.2 / 6.4 ms at 131k gaussians.
    compute_dtype: str = "bfloat16"
    # bf16 COTANGENTS for the MLP backward (round 5): casts the inter-layer
    # cotangents to bf16 before the transposed dots (fp32 accumulation
    # kept).  The round-4 ISOLATED-MLP probe suggested 5.2 -> 2.8 ms, but
    # the round-5 full-step same-process A/B (tools/probe_r05b.py, 800px
    # packed train) measured only 44.0 -> 43.5 ms (loss fwd+bwd 32.6 ->
    # 32.3) — the isolated win does not survive in the full graph, so the
    # 8-bit gradient truncation is not worth ~0.4 ms.  Kept as a measured
    # A/B knob; default False.
    bf16_cotangents: bool = False
    # Rows per lax.map block of the MLP application: bounds compiled code
    # size (an unbounded fused posenc+matmul lowering grew with the row
    # count past the remote-AOT helper's 2 GiB executable cap) with
    # identical arithmetic.  0 = unblocked.
    block_rows: int = 65536


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Render pipeline flags (reference: PipelineParams, arguments/__init__.py:64-69)."""

    convert_shs_python: bool = False
    compute_cov3d_python: bool = False
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Tile rasterizer capacities — the static-shape contract.

    The CUDA reference sizes its duplicated key list dynamically per frame
    (rasterizer_impl.cu:70-111, 277-308).  On TPU all shapes are static: the
    per-frame (gaussian x tile) instance list has a fixed capacity and overflow
    is *surfaced* (never silently dropped without a counter).
    """

    tile_x: int = 16  # BLOCK_X (config.h:16)
    tile_y: int = 16  # BLOCK_Y (config.h:17)
    # Capacity of the duplicated [tile|depth]-sorted instance list per frame.
    # The reference's `num_rendered` for 100k-1M gaussians is typically <2M.
    instance_capacity: int = 1 << 21
    # Gaussians per inner chunk of the Pallas kernels; must be a multiple of
    # the 128 lane width on real TPU (interpret mode accepts any value).
    chunk: int = 128
    # Tiles composited per Pallas grid step: DMA waves across the batch
    # overlap and per-step overhead amortizes (outputs are bitwise identical
    # across batch sizes; 8 measured ~0.25 ms faster than 4 at 1080p).
    tile_batch: int = 8
    # Opacity-aware instance culling (see ops/projection.py): image- and
    # gradient-exact, changes only debug counters; False = reference radii.
    opacity_aware_radius: bool = True
    # Exact per-tile ellipse cull (projection.tile_ellipse_mask): drops
    # AABB-corner tiles the alpha >= 1/255 ellipse misses.  Contribution-
    # exact like opacity_aware_radius (float rounding only); shrinks
    # instance counts ~15-30%, so the sort/gather/composite all get cheaper.
    # Changes the n_contrib debug counter and capacity accounting.
    tile_cull: bool = True
    # Composite kernel schedule. "batch" = tile-batched kernel (manual DMA
    # waves per tile, ops/pallas/composite.py). "stream" = flat chunk-stream
    # kernel (auto-pipelined contiguous DMA, persistent per-tile VMEM state,
    # ops/pallas/stream_composite.py). Same math, bit-identical outputs
    # (verified on chip). Measured on v5e at 1080p/1M instances: batch fwd
    # 11.9ms / bwd 19.5ms; stream fwd 15.0ms / bwd 16.3ms — both are bound by
    # per-chunk serial instruction latency; batch interleaves 4 independent
    # tiles and wins the forward, stream's ring-prefetched backward wins the
    # backward. "mixed" pairs the batch forward with the stream backward.
    # (A fourth "section" schedule — F independent tile-aligned stream
    # sections per grid step — measured 5x slower than mixed at 1080p and
    # was deleted in round 3; see README's measured-and-rejected log.)
    # "packed" aligns tiles to `sub_chunk` rows instead of a full DMA chunk
    # (ops/pallas/packed_composite.py): the aligned layout shrinks ~45% at
    # 1080p (padding is the dominant layout cost at ~66 instances/tile), and
    # the kernels run a chunk-wide segmented scan over mixed-tile chunks.
    composite_mode: str = "mixed"
    # Tile alignment granularity of the packed schedule (divides chunk).
    sub_chunk: int = 32
    # Chunk slots per grid step of the stream kernels.
    stream_chunks: int = 8
    # Budget (rows) for the chunk-aligned layout's total per-tile padding;
    # -1 = exact worst case (num_tiles*chunk).  A tighter budget shrinks all
    # Kp-proportional costs; overflow is surfaced via required_aligned (the
    # training loop grows it like instance_capacity).
    aligned_slack: int = -1
    # Sort strategy for the [tile|depth] keys. "exact" = two-key stable sort
    # (bit-for-bit the CUB radix order). "packed" = single uint32 key with the
    # tile id in the top 13 bits and the top 19 float bits of depth below —
    # same order except for ties closer than ~0.1% relative depth (still
    # deterministic: stable by emission order). Faster on TPU.
    # "radix" = bit-exact CUB order with NO jax.lax.sort: gaussians are
    # depth-ranked once by a P-sized LSD radix, the instance stream is
    # emitted rank-major, and a stable counting partition groups it by tile
    # (ops/scan_utils.py). Slower than "exact" on a direct TPU backend, but
    # its compiled code size is independent of the instance count — the XLA
    # TPU sort's code grows with input length and alone overflows the 2 GiB
    # remote-AOT executable cap at ~1M instances — and it compiles orders of
    # magnitude faster through the remote-compile tunnel.
    # "auto" = "exact" on a direct TPU backend, "radix" under remote-AOT
    # ("axon") where lax.sort cannot ship at full scene scale.
    sort_mode: str = "auto"
    # Segment-fill / relayout backend inside bin_gaussians.  "pallas_all"
    # (default since round 4) = the streamed ordered_fill kernels for BOTH
    # the K-sized segment prefix fills AND the Kp-sized relayout place —
    # bit-identical to the scatters by construction (integer payloads
    # through an exact 3-term bf16 Dekker-split matmul).  The round-4
    # two-level mask factorization (ordered_fill.py) made the kernels win
    # everywhere (on-chip, bench scale: fills 0.4 ms kernel vs 4.6 scatter;
    # relayout place 1.5 vs 2.2 — tools/probe_r04.py; round 3's flat mask
    # lost the relayout 4.1 vs 2.4).  "pallas" = kernel fills + XLA scatter
    # relayout (the round-3 default, kept for A/B).  "scatter" = XLA
    # scatters everywhere (always-working fallback; bench.py degrades to it
    # automatically on compile failure).  Gated on the real Mosaic compiler
    # by tools/smoke_tpu.py + tools/parity_onchip.py (round 2 shipped these
    # kernels untested on-chip and every TPU graph died).
    fill_mode: str = "pallas_all"
    # Transmittance scan strategy inside the composite kernels. "linear"
    # (default) = Hillis-Steele shift-multiply prefix product, pure VPU, no
    # transcendentals and no first-hit min-reduction; also drops one of the
    # backward's two MXU prefixes. "log" = log-space cumsum as one
    # triangular matmul on the MXU (log1p/exp/divide on the VPU).
    # Semantically identical; float rounding differs at ~1e-7 relative
    # (both ~1e-7 from the sequential CUDA order).  Round-3 on-chip A/B:
    # linear is -1.5 ms on the 1080p render (33.4 vs 34.9) and -1.2 ms on
    # the 800px mixed train step — the HIGHEST-precision tril matmul the
    # log scan needs (Mosaic's default dot is one bf16 pass) made the MXU
    # form lose its round-1 edge.  The packed schedule implements log only
    # (its segmented prefix rides the same tril matmul) and forces it.
    scan_mode: str = "linear"
    # Per-gaussian gradient reduction for the sorted-splat gather's VJP.
    # "sort" (default since round 4) = single-key gid sort + block-local
    # segmented scan + segment-aware carry chain (ops/segsum.py) — this
    # environment's TPU scatter-ADD runs ~13 ns per gradient row (4.6 ms at
    # the 800px train scale) while the whole sort path runs ~1.0 ms
    # (tools/probe_r04.py).  Round 3's sort path was rejected on accuracy
    # (global-prefix boundary diffs cancel at O(eps * |running sum|)); the
    # round-4 segmented-scan redesign sums each gaussian's own rows only
    # and passes the committed exact-culling gradient parity bar.
    # "scatter" = XLA's native gather-transpose lowering (fallback / A/B).
    grad_reduce: str = "sort"
    # Deferred forward T/n_contrib reductions in the tile-batched composite
    # kernel: fold the per-chunk sublane min/max reductions into carried
    # elementwise buffers, reducing once per tile.  Value-identical in
    # linear scan mode — but MEASURED SLOWER on-chip (round-5 same-process
    # A/B at 1080p bench scale: 23.6 ms deferred vs 21.1 per-chunk): Mosaic
    # sublane reductions cost ~1-2 array passes, cheaper than the deferral's
    # 2x (chunk, npix) buffer read+write per chunk.  Kept as a measured
    # A/B knob; default False (per-chunk reductions).
    defer_fwd_reductions: bool = False
    # Composite termination threshold (forward.cu:347).
    transmittance_eps: float = 1e-4
    # Per-splat alpha clamp (forward.cu:343-344).
    alpha_max: float = 0.99
    alpha_min: float = 1.0 / 255.0


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Optimization schedule (reference: OptimizationParams, arguments/__init__.py:71-89
    plus hard-coded constants listed in the module docstring)."""

    iterations: int = 40_000
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 40_000
    # Deformation-MLP LR schedule (hard-coded at gaussian_model.py:862-864).
    offset_lr_init: float = 8e-4
    offset_lr_final: float = 1.6e-6
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    # Offset-norm regularizer weight (hard-coded 0.1 at train.py:332).
    lambda_offset_norm: float = 0.1
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4
    # Pruning opacity floor (hard-coded at train.py:620).
    min_opacity: float = 0.005
    # Screen-size prune threshold once opacity resets begin (train.py:643).
    max_screen_size: int = 20
    # Offset-gated densification (latent reference capability,
    # gaussian_model.py:1154-1249 / train.py:652-676): clone/split only
    # gaussians whose latest |dx| >= this threshold.  0 = off (active path).
    # The commented reference experiments used 0.3 (and 0.5 late).
    densify_offset_gate: float = 0.0
    adam_eps: float = 1e-15  # gaussian_model.py:856
    adam_b1: float = 0.9
    adam_b2: float = 0.999


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout for multi-chip training."""

    # Number of devices along the data axis (cameras/timesteps per step).
    data_axis: int = 1
    # Number of devices along the model axis (gaussians + image tiles sharded).
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    deform: DeformConfig = dataclasses.field(default_factory=DeformConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    raster: RasterizeConfig = dataclasses.field(default_factory=RasterizeConfig)
    opt: OptimizationConfig = dataclasses.field(default_factory=OptimizationConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
