"""Pallas kernel: column-wise prefix sum of deltas scattered at sorted rows.

Computes, for sorted unique int32 positions ``pos`` (entries >= K drop) and
fp32 deltas (n, C):

    out[k, c] = sum over j with pos[j] <= k of delta[j, c]        (K, C)

i.e. exactly ``cumsum_cols(zeros(K, C).at[pos].set(delta))`` — the segment
fill primitive of ops/binning.  XLA's TPU scatter costs ~40 ns per scattered
ROW in this environment regardless of mode/uniqueness hints (tools/
profile_r8: the 131k-row fill scatter alone is ~5.2 ms at bench scale), so
this kernel replaces scatter+cumsum with a streamed prefix-placement:

- the grid walks output blocks of ``block`` rows SEQUENTIALLY, carrying the
  running column sums in persistent VMEM scratch;
- a 2-slot ring of input chunks (aligned DMA, advanced by prefetched
  per-block input offsets) holds every input row that can land in the
  current block;
- placement + prefix happen as ONE masked matmul per ring slot:
  W[r, j] = (0 <= pos_j - base <= r), out_block = carry + sum_s W_s @ delta_s.

Exactness: the fills carry integers < 2^24 in fp32 lanes; every partial sum
is integral and below 2^24, so ANY accumulation order (MXU matmul included —
Mosaic fp32 dots are exact) reproduces the XLA scatter+cumsum bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, pos_hbm, delta_hbm, out_ref, carry, pbuf, dbuf,
            meta, sem, *, block: int, C: int, nb: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[:] = jnp.zeros((1, C), jnp.float32)
        meta[0] = -1  # highest loaded chunk index
        # Unloaded ring slots must never place: park positions out of range
        # AND zero the deltas (a 0-weight times NaN garbage is still NaN
        # through the placement matmul).
        pbuf[:, :] = jnp.full((2, block), 2_000_000_000, jnp.int32)
        dbuf[:, :, :] = jnp.zeros((2, block, C), jnp.float32)

    def load(cidx):
        slot = jax.lax.rem(cidx, 2)
        cp_p = pltpu.make_async_copy(
            pos_hbm.at[pl.ds(cidx * block, block)], pbuf.at[slot],
            sem.at[slot, 0],
        )
        cp_d = pltpu.make_async_copy(
            delta_hbm.at[pl.ds(cidx * block, block), :], dbuf.at[slot],
            sem.at[slot, 1],
        )
        cp_p.start()
        cp_d.start()
        cp_p.wait()
        cp_d.wait()

    # Inputs for this block are rows [starts[b], starts[b+1]) — at most
    # `block` rows (pos unique), spanning <= 2 consecutive aligned chunks.
    # The needed chunk advances <= 1 per block, so two conditional loads
    # cover both steady state and start-up.
    hi = starts_ref[b + 1]
    c_hi = jnp.maximum(hi - 1, 0) // block
    for _ in range(2):
        @pl.when(meta[0] < c_hi)
        def _():
            load(meta[0] + 1)
            meta[0] = meta[0] + 1

    base = b * block
    row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    acc = jnp.broadcast_to(carry[:], (block, C))
    for slot in range(2):
        d = pbuf[slot][None, :] - base  # (1, block) vs rows
        w = ((d >= 0) & (d <= row)).astype(jnp.float32)
        acc = acc + jnp.dot(w, dbuf[slot], preferred_element_type=jnp.float32)
    out_ref[:, :] = acc
    carry[:] = acc[block - 1 :, :]


@functools.lru_cache(maxsize=None)
def _make_call(n_pad: int, K_pad: int, C: int, block: int, interpret: bool):
    nb = K_pad // block
    return pl.pallas_call(
        functools.partial(_kernel, block=block, C=C, nb=nb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # pos (n_pad,)
                pl.BlockSpec(memory_space=pltpu.ANY),  # delta (n_pad, C)
            ],
            out_specs=pl.BlockSpec(
                (block, C), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((1, C), jnp.float32),       # carry
                pltpu.VMEM((2, block), jnp.int32),      # pos ring
                pltpu.VMEM((2, block, C), jnp.float32),  # delta ring
                pltpu.SMEM((1,), jnp.int32),            # loaded-chunk meta
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((K_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


def ordered_prefix_fill(
    pos: jnp.ndarray,
    delta: jnp.ndarray,
    K: int,
    *,
    block: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """See module docstring.  pos (n,) int32 sorted ascending unique (values
    >= K are dropped); delta (n, C) fp32.  Returns (K, C) fp32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, C = delta.shape
    n_pad = max(((n + block - 1) // block) * block, block) + block
    K_pad = max(((K + block - 1) // block) * block, block)
    # Padding rows carry an always-OOB position (> any block base + block)
    # and zero deltas, so ring chunks past the real input are inert.
    pos_p = jnp.full((n_pad,), K_pad + n_pad, jnp.int32).at[:n].set(pos)
    delta_p = jnp.zeros((n_pad, C), jnp.float32).at[:n, :].set(delta)
    # bisect_left of each block boundary into pos (log2 rounds of tiny takes)
    from ..binning import take_searchsorted

    bounds = jnp.arange(K_pad // block + 1, dtype=jnp.int32) * block
    starts = take_searchsorted(pos_p, bounds)
    out = _make_call(n_pad, K_pad, C, block, interpret)(
        starts, pos_p, delta_p
    )
    return out[:K]
