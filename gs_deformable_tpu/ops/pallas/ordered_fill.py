"""Pallas kernels: prefix-fill / placement of values scattered at sorted rows.

``ordered_prefix_fill`` computes, for sorted unique int32 positions ``pos``
(entries >= K drop) and fp32 deltas (n, C):

    out[c, k] = sum over j with pos[j] <= k of delta[j, c]        (C, K)

i.e. exactly ``cumsum_cols(zeros(K, C).at[pos].set(delta)).T`` — the segment
fill primitive of ops/binning.  ``ordered_place_i32`` is the no-prefix
sibling: ``zeros(K).at[pos].set(vals)`` (the chunk-aligned relayout).
XLA's TPU scatter costs ~40 ns per scattered ROW in this environment
regardless of mode/uniqueness hints (tools/profile_r8: the 131k-row fill
scatter alone is ~5.2 ms at bench scale), so these kernels replace
scatter(+cumsum) with a streamed placement:

- the grid walks output blocks of ``block`` rows SEQUENTIALLY; the prefix
  variant carries the running column sums in persistent VMEM scratch;
- because positions are sorted and unique, every input row that can land in
  output block b lies in rows [starts[b], starts[b] + block] — one aligned
  2*block DMA window per block covers it (double-buffered across blocks via
  two explicit scratch pairs selected by block parity under pl.when; Mosaic
  permits neither sub-tile slices of a 1-D ring nor sublane-dim slicing of a
  (2, block) int32 ring, so the slots are separate buffers);
- placement (+ prefix) is ONE masked matmul per block:
  Wt[j, r] = (0 <= pos_j - base <= r)  (prefix)  /  (pos_j - base == r)
  (place), out_block(C, block) = [carry +] delta_window(C, win) @ Wt.

Real-TPU Mosaic constraints baked in (each cost one on-chip failure):
- dynamic DMA starts must carry a divisibility PROOF — ``pl.multiple_of``
  on the aligned-down window start (the bare ``//block*block`` form fails
  "Failed to prove that a tile index ... is divisible by the tiling");
- DMA slice lane dims must be 128-aligned, so the delta stream rides a
  TRANSPOSED (Cp, n_pad) field-major layout (a (win, C) slice with C < 128
  lanes is rejected) with the channel dim padded to the fp32 sublane tile
  (Cp = 8); callers consume output ROWS of the (Cp, K) result.

Exactness: the fills carry integers < 2^24 in fp32 lanes; every partial sum
is integral and below 2^24.  Mosaic's in-kernel ``jnp.dot`` lowers to ONE
bf16 pass by default (round-3 finding; ``Precision.HIGHEST`` = 6 passes and
loses the A/B, ``HIGH`` is rejected), so the placement matmuls use the exact
3-term bf16 Dekker split (``_dekker_dot``): each operand splits into bf16
components whose products are exact for integers < 2^24, and the three
DEFAULT-precision dots reproduce the XLA scatter+cumsum bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = 8  # channel rows padded to the fp32 sublane tile


def _kernel(starts_ref, pos_hbm, delta_hbm, out_ref, carry,
            pbuf_a, dbuf_a, pbuf_b, dbuf_b, sem,
            *, block: int, n_pad: int, nb: int, prefix: bool,
            mask_mode: str = "twolevel"):
    b = pl.program_id(0)
    win = 2 * block

    def window_start(idx):
        aligned = (starts_ref[idx] // block) * block
        # Both operands are multiples of `block` (n_pad is block-aligned and
        # win = 2*block), but Mosaic cannot prove divisibility of a dynamic
        # index through // and min — pl.multiple_of carries the proof.
        return pl.multiple_of(jnp.minimum(aligned, n_pad - win), block)

    def copies(idx, pb, db, s0, s1):
        start = window_start(idx)
        return (
            pltpu.make_async_copy(
                pos_hbm.at[pl.ds(start, win)], pb, sem.at[s0]
            ),
            pltpu.make_async_copy(
                delta_hbm.at[:, pl.ds(start, win)], db, sem.at[s1]
            ),
        )

    def issue(idx):
        @pl.when(idx % 2 == 0)
        def _():
            for cp in copies(idx, pbuf_a, dbuf_a, 0, 1):
                cp.start()

        @pl.when(idx % 2 == 1)
        def _():
            for cp in copies(idx, pbuf_b, dbuf_b, 2, 3):
                cp.start()

    def wait(idx):
        @pl.when(idx % 2 == 0)
        def _():
            for cp in copies(idx, pbuf_a, dbuf_a, 0, 1):
                cp.wait()

        @pl.when(idx % 2 == 1)
        def _():
            for cp in copies(idx, pbuf_b, dbuf_b, 2, 3):
                cp.wait()

    @pl.when(b == 0)
    def _():
        if prefix:
            carry[:] = jnp.zeros((_CP, 1), jnp.float32)
        issue(0)

    @pl.when(b + 1 < nb)
    def _():
        issue(b + 1)

    wait(b)

    def compute(pvals, dvals):
        # pvals (win,) i32; dvals (Cp, win) f32
        base = b * block
        # Placement matmul precision: on the real chip the Mosaic dot lowers
        # to ONE bf16 MXU pass by default, which corrupts integer payloads
        # > 2^8 (caught on-chip in round 3 — round-1's "Mosaic fp32 dots
        # are exact" no longer holds).  HIGHEST (6-pass) is exact but made
        # the kernel LOSE its A/B vs the XLA scatter (37.8 vs 36.9 ms at
        # bench scale), and Mosaic rejects Precision.HIGH — so the 3-term
        # bf16 Dekker split is hand-rolled: an fp32 integer |v| < 2^24
        # splits EXACTLY into three bf16 components that are each integers
        # (8+8+8 mantissa bits; each residual is fp32-exact by Sterbenz),
        # the mask side is 0/1 (exact single term), every product is an
        # exact bf16 multiply, and the fp32 accumulation stays on integers
        # < 2^24.  Three single-pass bf16 dots = half the HIGHEST cost.
        # Verified bitwise on-chip by smoke_tpu's integer cross-check.
        hi = dvals.astype(jnp.bfloat16)
        r1 = dvals - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        if mask_mode == "flat":
            row = jax.lax.broadcasted_iota(jnp.int32, (win, block), 1)
            d = pvals[:, None] - base  # (win, 1)
            if prefix:
                wt = ((d >= 0) & (d <= row)).astype(jnp.bfloat16)
            else:
                wt = (d == row).astype(jnp.bfloat16)
            out = sum(
                jnp.dot(part, wt, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                for part in (hi, mid, lo)
            )
            if prefix:
                acc = jnp.broadcast_to(carry[:], (_CP, block)) + out
                out_ref[:, :] = acc
                carry[:] = acc[:, block - 1 :]
            else:
                out_ref[:, :] = out
            return
        # Two-level placement: the flat (win, block) compare mask is ~90% of
        # the kernel's VPU time (round-3 cost model: the mask build dominates
        # the bf16 dots).  Factor the lane index r = 128*q + s: the bucket
        # membership (d >> 7 == q, an (nq, win) mask) and the sub-position
        # (d & 127 vs s, a (win, 128) mask) together are ~7x fewer mask
        # lanes than (win, block).  The contraction over window rows becomes
        # ONE (nq*Cp, win) @ (win, 128) dot per Dekker component, with A's
        # rows [nq*q + c] = delta_c * bucket_q; bucket slices of the output
        # write lane-groups 128*q..128*q+127.  Rows with d < 0 or
        # d >= block match no bucket (arithmetic >> keeps negatives
        # negative), so OOB window rows stay inert exactly as before.
        # Exactness is unchanged: bucket/sub masks are 0/1 (exact bf16
        # factors) and every partial sum remains an integer < 2^24 in fp32;
        # only the (associativity-free) accumulation grouping differs.
        nq = block // 128
        d_row = pvals[None, :] - base  # (1, win)
        q_col = jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0)
        bq = ((d_row >> 7) == q_col).astype(jnp.bfloat16)  # (nq, win)
        d_sub = (pvals[:, None] - base) & 127  # (win, 1)
        s_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        if prefix:
            sub = (d_sub <= s_row).astype(jnp.bfloat16)  # (win, 128)
        else:
            sub = (d_sub == s_row).astype(jnp.bfloat16)
        outs = []
        for part in (hi, mid, lo):
            a = jnp.concatenate(
                [part * bq[q : q + 1, :] for q in range(nq)], axis=0
            )  # (nq*Cp, win)
            outs.append(
                jnp.dot(a, sub, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            )
        o = outs[0] + outs[1] + outs[2]  # (nq*Cp, 128)
        if prefix:
            # Bucket q's lanes need carry + sum of all earlier buckets;
            # column 127 of each bucket block is its full bucket sum
            # (d & 127 <= 127 always holds).
            t = carry[:]
            for q in range(nq):
                blk = o[_CP * q : _CP * (q + 1), :]
                out_ref[:, 128 * q : 128 * (q + 1)] = blk + t
                t = t + blk[:, 127:128]
            carry[:] = t
        else:
            for q in range(nq):
                out_ref[:, 128 * q : 128 * (q + 1)] = o[
                    _CP * q : _CP * (q + 1), :
                ]

    # The buffer pair is selected by block parity under pl.when — reading
    # BOTH pairs and where-merging would touch the slot whose next-block DMA
    # is already in flight (a formal read-under-DMA race, 2x VMEM traffic).
    @pl.when(b % 2 == 0)
    def _():
        compute(pbuf_a[...], dbuf_a[...])

    @pl.when(b % 2 == 1)
    def _():
        compute(pbuf_b[...], dbuf_b[...])


@functools.lru_cache(maxsize=None)
def _make_call(n_pad: int, K_pad: int, block: int, interpret: bool,
               prefix: bool = True, mask_mode: str = "twolevel"):
    nb = K_pad // block
    win = 2 * block
    return pl.pallas_call(
        functools.partial(
            _kernel, block=block, n_pad=n_pad, nb=nb, prefix=prefix,
            mask_mode=mask_mode,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # pos (n_pad,)
                pl.BlockSpec(memory_space=pl.ANY),  # delta (Cp, n_pad)
            ],
            out_specs=pl.BlockSpec(
                (_CP, block), lambda b, *_: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_CP, 1), jnp.float32),       # carry
                pltpu.VMEM((win,), jnp.int32),            # pos slot A
                pltpu.VMEM((_CP, win), jnp.float32),      # delta slot A
                pltpu.VMEM((win,), jnp.int32),            # pos slot B
                pltpu.VMEM((_CP, win), jnp.float32),      # delta slot B
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_CP, K_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


def _prep(pos, n, block):
    """Pad inputs so every aligned 2*block window stays in bounds."""
    n_pad = max(((n + block - 1) // block) * block, block) + 2 * block
    return n_pad


def ordered_prefix_fill(
    pos: jnp.ndarray,
    delta: jnp.ndarray,
    K: int,
    *,
    block: int = 1024,
    interpret: bool | None = None,
    mask_mode: str = "twolevel",
) -> jnp.ndarray:
    """See module docstring.  pos (n,) int32 sorted ascending unique (values
    >= K are dropped); delta (n, C) fp32.  Returns field-major (C, K) fp32
    (row c is the prefix-filled column c — callers consume rows, avoiding a
    (K, C) relayout).  C <= 8.

    ``block`` must stay a multiple of 1024 on real TPU: the 1-D position
    array's DMA windows are tiled at 1024 int32 lanes.  ``mask_mode``:
    "twolevel" (default, factored bucket/sub masks) or "flat" (the round-3
    (win, block) compare mask, kept for A/B) — bitwise identical outputs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert block % 1024 == 0, "block must be a multiple of 1024 (1-D i32 DMA tiling)"
    n, C = delta.shape
    assert C <= _CP, f"ordered_prefix_fill supports <= {_CP} columns"
    n_pad = _prep(pos, n, block)
    K_pad = max(((K + block - 1) // block) * block, block)
    # Padding rows carry an always-OOB position (> any block base + block)
    # and zero deltas, so window rows past the real input are inert.
    pos_p = jnp.full((n_pad,), K_pad + n_pad, jnp.int32).at[:n].set(pos)
    # Field-major, channel-padded to the fp32 sublane tile (DMA slices ride
    # the 128-lane dim; a (win, C) slice with C < 128 lanes is rejected).
    delta_p = jnp.zeros((_CP, n_pad), jnp.float32).at[:C, :n].set(delta.T)
    # bisect_left of each block boundary into pos (log2 rounds of tiny takes)
    from ..binning import take_searchsorted

    bounds = jnp.arange(K_pad // block + 1, dtype=jnp.int32) * block
    starts = take_searchsorted(pos_p, bounds)
    out = _make_call(n_pad, K_pad, block, interpret, True, mask_mode)(
        starts, pos_p, delta_p
    )
    return out[:C, :K]


def ordered_place_i32(
    pos: jnp.ndarray,
    vals: jnp.ndarray,
    K: int,
    *,
    block: int = 1024,
    interpret: bool | None = None,
    mask_mode: str = "twolevel",
) -> jnp.ndarray:
    """``zeros(K, i32).at[pos].set(vals)`` for sorted unique int32 positions.

    Place-mode sibling of ordered_prefix_fill (equality mask, no carry):
    replaces the chunk-aligned relayout scatter of ops/binning (~2.6 ms for
    590k rows at bench scale under this environment's serialized scatters).
    Values ride fp32 lanes through the placement matmul — exact below 2^24
    (gaussian ids are < the param capacity, far under that).  Positions >= K
    drop; unset rows are 0 (binning's padding-slots-point-at-gaussian-0
    convention).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert block % 1024 == 0, "block must be a multiple of 1024 (1-D i32 DMA tiling)"
    n = pos.shape[0]
    n_pad = _prep(pos, n, block)
    K_pad = max(((K + block - 1) // block) * block, block)
    pos_p = jnp.full((n_pad,), K_pad + n_pad, jnp.int32).at[:n].set(
        jnp.minimum(pos, K_pad + jnp.arange(n, dtype=jnp.int32))
    )
    delta_p = jnp.zeros((_CP, n_pad), jnp.float32).at[0, :n].set(
        vals.astype(jnp.float32)
    )
    from ..binning import take_searchsorted

    bounds = jnp.arange(K_pad // block + 1, dtype=jnp.int32) * block
    starts = take_searchsorted(pos_p, bounds)
    out = _make_call(n_pad, K_pad, block, interpret, False, mask_mode)(
        starts, pos_p, delta_p
    )
    return out[0, :K].astype(jnp.int32)
