"""Time-conditioned deformation networks — the core novelty of the reference.

Re-design of the ``DirectTemporalNeRF`` family
(/root/reference/scene/gaussian_model.py:33-628) as pure-pytree JAX functions:

- ``posenc``: NeRF positional encoding (Embedder, gaussian_model.py:33-81) —
  x -> [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)].
- ``DeformMLP``: the shared body — D=8 hidden layers of width 256, ReLU, skip
  re-concat of the encoded input (input first!) after layer index 4
  (query_time, gaussian_model.py:279-288).
- ``deform_offsets``: the ACTIVE 4-head net (gaussian_model.py:242-316):
  (posenc(xyz) 63 + posenc(t) 21) -> dx(3), d_scale(3), d_rot(4), d_shs(48).
- ``deform_se3``: the SE(3) exponential-map variant
  (gaussian_model.py:99-173): raw (xyz 3 + t 1) -> w(3), v(3); theta = |w|;
  screw axis normalized by theta; exp_se3 -> per-gaussian 4x4 transforms.
- The latent per-head variants (rot / scaling / opacity-mask / shs nets,
  gaussian_model.py:386-628) are exposed through ``make_latent_heads`` so the
  checkpoint surface can preserve them like the reference does
  (gaussian_model.py:924-929) even though only the main net trains.

The static warmup (all offsets forced to zero while iteration < 3000,
gaussian_model.py:308-313) is implemented with ``lax.cond`` so the MLP compute
is *skipped* during warmup, not just overwritten — unlike the reference, which
always evaluates the MLP then discards the result (SURVEY.md section 2.3).

All matmuls run in the param dtype; weights can be held in float32 and cast to
bfloat16 for the MXU via the ``compute_dtype`` argument.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import DeformConfig
from ..ops import rigid

Params = Dict[str, Any]


def posenc_dim(multires: int, input_dims: int) -> int:
    return input_dims * (1 + 2 * multires)


def posenc(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """NeRF positional encoding with include_input, log-sampled frequencies
    2^0 .. 2^(multires-1), ordered [sin, cos] per frequency
    (Embedder.create_embedding_fn, gaussian_model.py:38-63)."""
    feats = [x]
    for i in range(multires):
        freq = 2.0**i
        feats.append(jnp.sin(x * freq))
        feats.append(jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)


def _linear_init(key, fan_in: int, fan_out: int) -> Params:
    """torch nn.Linear default init: kaiming-uniform(a=sqrt(5)) weights,
    uniform(+-1/sqrt(fan_in)) bias — the init the reference nets train from."""
    wkey, bkey = jax.random.split(key)
    bound_w = math.sqrt(6.0 / fan_in) / math.sqrt(2.0)  # gain for a=sqrt(5)
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound_b, bound_b)
    return {"w": w, "b": b}


@jax.custom_vjp
def _bf16_mm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """One-pass bf16 MXU matmul whose BACKWARD also runs one-pass bf16.

    The default VJP of the bf16 forward feeds fp32 cotangents into the
    transposed dots; under this backend that lowers to a slower path than
    the forward's one-pass bf16 (round-4 probe: MLP fwd+bwd 5.2 ms fp32-
    cotangent vs 2.8 ms bf16-cotangent at 131k rows).  Here the cotangent
    is cast to bf16 before both transposed dots (fp32 accumulation kept) —
    this truncates inter-layer gradient significands to 8 bits, which the
    round-5 quality-anchor A/B bounds (see DeformConfig.bf16_cotangents).
    """
    return jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _bf16_mm_fwd(x, w):
    return _bf16_mm(x, w), (x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))


def _bf16_mm_bwd(res, g):
    xb, wb = res
    gb = g.astype(jnp.bfloat16)
    dx = jnp.dot(gb, wb.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.DEFAULT)
    dw = jnp.dot(xb.T, gb, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.DEFAULT)
    return dx, dw


_bf16_mm.defvjp(_bf16_mm_fwd, _bf16_mm_bwd)


def _linear(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if dtype == "bfloat16_bwd":
        # bf16 forward AND bf16-cotangent backward (quality knob, see
        # _bf16_mm; selected by DeformConfig.bf16_cotangents).
        return _bf16_mm(x, w) + b.astype(jnp.float32)
    precision = jax.lax.Precision.HIGHEST
    if dtype == "float32_3x":
        # Precision.HIGH = 3 bf16 passes: ~2x the HIGHEST throughput at
        # ~1e-6 relative error on unit-scale activations (the MLP's
        # precision tier is a quality knob, not a parity anchor — the
        # rasterizer math stays HIGHEST).
        dtype, precision = None, jax.lax.Precision.HIGH
    if dtype is not None:
        # bf16 operands want the ONE-pass MXU lowering; HIGHEST on bf16
        # inputs upcasts back to the 6-pass fp32 path, silently costing ~6x
        # (round-4 probe: the "bf16" deform trunk ran 9.7 ms, not ~2.5).
        # Only bf16 may take this branch: an fp32 dtype here would silently
        # run ONE bf16 pass (8 mantissa bits) — the documented TPU trap.
        if jnp.dtype(dtype) != jnp.bfloat16:
            raise ValueError(
                f"_linear compute dtype {dtype!r}: only bfloat16 (one-pass "
                "DEFAULT), 'float32_3x' (HIGH) or None (fp32 HIGHEST) are "
                "meaningful tiers; fp32 with DEFAULT would be a silent "
                "one-bf16-pass downgrade."
            )
        x, w = x.astype(dtype), w.astype(dtype)
        precision = jax.lax.Precision.DEFAULT
    return (
        jnp.dot(
            x, w, preferred_element_type=jnp.float32,
            precision=precision,
        )
        + b.astype(jnp.float32)
    )


def init_mlp(
    key,
    in_dim: int,
    skip_dim: int,
    head_dims: Tuple[int, ...],
    depth: int,
    width: int,
    skips: Tuple[int, ...],
) -> Params:
    """Trunk of `depth` layers + linear heads (create_time_net,
    gaussian_model.py:263-277).  Layer i>0 takes width(+skip_dim if (i-1) in
    skips, because the reference concatenates *after* applying layer i-1)."""
    keys = jax.random.split(key, depth + len(head_dims))
    layers = []
    fan_in = in_dim
    for i in range(depth):
        layers.append(_linear_init(keys[i], fan_in, width))
        fan_in = width + (skip_dim if i in skips else 0)
    heads = [
        _linear_init(keys[depth + j], width, hd) for j, hd in enumerate(head_dims)
    ]
    return {"layers": layers, "heads": heads}


def apply_mlp(
    params: Params,
    x_encoded: jnp.ndarray,
    t_encoded: jnp.ndarray,
    skips: Tuple[int, ...],
    compute_dtype=None,
) -> Tuple[jnp.ndarray, ...]:
    """query_time (gaussian_model.py:279-288): h = cat(x, t); D relu layers
    with skip re-concat cat([x, h]) after layer i in skips; then all heads."""
    h = jnp.concatenate([x_encoded, t_encoded], axis=-1)
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(_linear(layer, h, compute_dtype))
        if i in skips:
            h = jnp.concatenate([x_encoded, h], axis=-1)
    # All heads as ONE matmul: each narrow head (3/3/4/48 cols) would pad its
    # output to the 128-lane MXU tile and pay a full (N, W, 128) pass; the
    # concatenated (W, sum_dims) weight runs one pass and slices after.  The
    # per-head weights stay separate in the checkpoint (reference surface).
    dims = [h_["w"].shape[1] for h_ in params["heads"]]
    wcat = jnp.concatenate([h_["w"] for h_ in params["heads"]], axis=1)
    bcat = jnp.concatenate([h_["b"] for h_ in params["heads"]], axis=0)
    out = _linear({"w": wcat, "b": bcat}, h, compute_dtype)
    offs = [0]
    for d in dims:
        offs.append(offs[-1] + d)
    return tuple(
        out[:, offs[j] : offs[j + 1]] for j in range(len(dims))
    )


# ---------------------------------------------------------------------------
# The active 4-head offset network (DirectTemporalNeRF).
# ---------------------------------------------------------------------------


def init_offset_net(key, cfg: DeformConfig = DeformConfig()) -> Params:
    in_dim = posenc_dim(cfg.multires_xyz, 3) + posenc_dim(cfg.multires_time, 1)
    skip_dim = posenc_dim(cfg.multires_xyz, 3)
    return init_mlp(
        key,
        in_dim,
        skip_dim,
        head_dims=(3, 3, 4, cfg.sh_coeffs * 3),
        depth=cfg.depth,
        width=cfg.width,
        skips=cfg.skips,
    )


def _map_row_blocks(fn, inputs, n: int, block: int):
    """Apply ``fn(*row_arrays) -> tuple`` over row blocks via lax.map.

    XLA's TPU lowering of the fp32 (HIGHEST/HIGH) MLP matmuls emits code
    proportional to the ROW count (measured: the 8x256 trunk at 131k rows
    serializes to a 2.7 GiB executable — over the remote-AOT compile
    helper's 2 GiB cap — while 65k compiles fine).  Mapping fixed-size row
    blocks keeps compiled code size independent of N with identical per-row
    arithmetic.  Falls back to a single call when N is small or not
    divisible (capacities here are powers of two, so the divisibility
    always holds at scale)."""
    if block <= 0 or n <= block or n % block != 0:
        return fn(*inputs)
    nb = n // block
    stacked = tuple(x.reshape(nb, block, *x.shape[1:]) for x in inputs)
    outs = jax.lax.map(lambda args: fn(*args), stacked)
    return tuple(o.reshape(n, *o.shape[2:]) for o in outs)


def _effective_block(cfg: DeformConfig, compute_dtype, n: int = 0) -> int:
    """Row-block only the fp32 precision tiers (plus very large bf16).

    The lax.map exists solely to bound compiled code size, which blows up
    only under the 6-pass/3-pass fp32 lowerings; the bf16-DEFAULT tier
    compiles fine unblocked at full capacity AND the map's scan TRANSPOSE
    costs ~14 ms at 131k rows in the training backward (round-4c probe:
    deform fwd+bwd 19.4 ms blocked vs 5.4 unblocked, identical math).
    bf16 unblocked is only *evidenced* up to 131072 rows; past that
    (capacity doubling / larger scenes) block at 131072 so code size stays
    bounded instead of gambling against the remote-AOT 2 GiB executable cap."""
    if compute_dtype is not None and compute_dtype != "float32_3x":
        bf16_probed_rows = 131072
        return 0 if n <= bf16_probed_rows else bf16_probed_rows
    return cfg.block_rows


def deform_offsets(
    params: Params,
    xyz: jnp.ndarray,
    time: jnp.ndarray,
    iteration: jnp.ndarray,
    cfg: DeformConfig = DeformConfig(),
    compute_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dx, d_scale, d_rot, d_shs) — DirectTemporalNeRF.forward
    (gaussian_model.py:290-316), with the warmup gate as a lax.cond.

    Args:
      xyz: (N, 3) canonical positions.
      time: scalar or (N, 1) — all gaussians share the frame time (the
        reference asserts this at gaussian_model.py:302).
      iteration: scalar int (traced) — warmup gate input.
    """
    n = xyz.shape[0]
    t = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1, 1), (n, 1))

    def run(_):
        def blk(xb, tb):
            xe = posenc(xb, cfg.multires_xyz)
            te = posenc(tb, cfg.multires_time)
            # Barrier: without it XLA fuses the sin/cos encoding into the
            # first matmul's operand reads — recomputed per MXU pass, and
            # (measured) the fused lowering's code grows with the row count
            # past the 2 GiB executable cap at 131k rows.
            xe, te = jax.lax.optimization_barrier((xe, te))
            return apply_mlp(params, xe, te, cfg.skips, compute_dtype)

        return _map_row_blocks(
            blk, (xyz, t), n, _effective_block(cfg, compute_dtype, n))

    def zeros(_):
        return (
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 4), jnp.float32),
            jnp.zeros((n, cfg.sh_coeffs * 3), jnp.float32),
        )

    return jax.lax.cond(
        jnp.asarray(iteration) >= cfg.warmup_iters, run, zeros, operand=None
    )


# ---------------------------------------------------------------------------
# SE(3) exponential-map variant (DirectTemporalNeRF_se3).
# ---------------------------------------------------------------------------


def init_se3_net(key, cfg: DeformConfig = DeformConfig()) -> Params:
    # Raw inputs, no positional encoding (gaussian_model.py:101,126).
    return init_mlp(
        key, 3 + 1, 3, head_dims=(3, 3), depth=cfg.depth, width=cfg.width,
        skips=cfg.skips,
    )


def deform_se3(
    params: Params,
    xyz: jnp.ndarray,
    time: jnp.ndarray,
    iteration: jnp.ndarray,
    cfg: DeformConfig = DeformConfig(),
    compute_dtype=None,
) -> jnp.ndarray:
    """Deformed positions via per-gaussian SE(3) transforms
    (gaussian_model.py:153-173 + the consumer path at
    gaussian_renderer/__init__.py:91-95: from_homogenous(T @ to_homogenous(x))).

    Returns the new positions (N, 3); during warmup returns xyz unchanged.
    """
    n = xyz.shape[0]
    t = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1, 1), (n, 1))

    def run(_):
        def blk(xb, tb):
            w, v = apply_mlp(params, xb, tb, cfg.skips, compute_dtype)
            theta = jnp.linalg.norm(w, axis=-1)
            safe = jnp.maximum(theta, 1e-12)[..., None]
            screw = jnp.concatenate([w / safe, v / safe], axis=-1)
            transform = rigid.exp_se3(screw, theta)
            moved = rigid.from_homogenous(
                jnp.einsum("nij,nj->ni", transform, rigid.to_homogenous(xb),
                           precision=jax.lax.Precision.HIGHEST)
            )
            return (moved,)

        (moved,) = _map_row_blocks(
            blk, (xyz, t), n, _effective_block(cfg, compute_dtype, n))
        return moved

    return jax.lax.cond(
        jnp.asarray(iteration) >= cfg.warmup_iters, run, lambda _: xyz, operand=None
    )


# ---------------------------------------------------------------------------
# Latent per-head variants (instantiated but untrained in the reference;
# preserved for checkpoint-surface parity, gaussian_model.py:680-684).
# ---------------------------------------------------------------------------


def make_latent_heads(key, cfg: DeformConfig = DeformConfig()) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    te_dim = posenc_dim(cfg.multires_time, 1)
    return {
        # DirectTemporalNeRF_rot: (xyz+quat 7, t-enc 21) -> 4, D=3 (:441-502)
        "rot": init_mlp(k1, 7 + te_dim, 7, (4,), 3, cfg.width, cfg.skips),
        # DirectTemporalNeRF_scaling: (xyz+scale 6, t 1) -> 3 (:386-438)
        "scaling": init_mlp(k2, 6 + 1, 6, (3,), cfg.depth, cfg.width, cfg.skips),
        # DirectTemporalNeRF_opacitymask: (xyz 3, t 1) -> 1 sigmoid (:505-558)
        "opacity_mask": init_mlp(k3, 3 + 1, 3, (1,), cfg.depth, cfg.width, cfg.skips),
        # DirectTemporalNeRF_shs: (xyz 3, t 1) -> 48 (:561-628)
        "shs": init_mlp(k4, 3 + 1, 3, (cfg.sh_coeffs * 3,), cfg.depth, cfg.width, cfg.skips),
    }


def opacity_mask_gate(
    params: Params,
    xyz: jnp.ndarray,
    time: jnp.ndarray,
    iteration: jnp.ndarray,
    cfg: DeformConfig = DeformConfig(),
) -> jnp.ndarray:
    """Multiplicative opacity gate in [0, 1] (DirectTemporalNeRF_opacitymask;
    consumer commented at gaussian_renderer/__init__.py:101-103).  During
    warmup the gate is 1 (the reference forces ones, gaussian_model.py:548-553)."""
    n = xyz.shape[0]
    t = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1, 1), (n, 1))

    def run(_):
        def blk(xb, tb):
            return apply_mlp(params["opacity_mask"], xb, tb, cfg.skips)

        (logit,) = _map_row_blocks(blk, (xyz, t), n, cfg.block_rows)
        return jax.nn.sigmoid(logit)

    return jax.lax.cond(
        jnp.asarray(iteration) >= cfg.warmup_iters,
        run,
        lambda _: jnp.ones((n, 1), jnp.float32),
        operand=None,
    )
