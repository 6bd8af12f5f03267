"""Fast scans for TPU: blocked cumsum/cummax without XLA's reduce-window scan.

XLA lowers 1-D cumulative ops on TPU to a sequence of strided passes that
measure milliseconds even at 10^5 elements (profiled on v5e — see
tools/profile_binning.py).  A blocked formulation is far faster:

- cumsum: reshape to (rows, 128); the within-row inclusive scan is one
  (rows,128)@(128,128) upper-triangular matmul on the MXU; row offsets come
  from recursing on the per-row totals.  int32 values are carried in fp32
  (exact up to 2^24; binning counts are << that).
- cummax: log2(128) masked lane shifts within rows + a recursive row-carry
  pass; max has no matmul form but the shift passes are plain VPU work.

Used by the binning pipeline (ops/binning.py) where the instance expansion
and chunk layout need prefix sums over 10^5-10^6 elements per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128

# These matmuls carry INTEGER values (counts, offsets, bit-packed fields) in
# fp32 lanes; exactness below 2^24 is the whole contract.  TPU's DEFAULT
# matmul precision rounds fp32 operands to ONE bf16 pass (8 mantissa bits):
# every carried value above 2^8 silently loses low bits — measured corrupting
# the entire binning layout at bench scale (tile counts summed to 6,422 for a
# 427,748-instance frame) while all CPU tests stayed green (CPU matmuls are
# exact at any precision).  HIGHEST forces the full-precision multi-pass
# lowering; these cumsum matmuls are a tiny fraction of frame time.
_EXACT = jax.lax.Precision.HIGHEST


def _dot_exact(a, b):
    return jnp.dot(
        a, b, precision=_EXACT, preferred_element_type=jnp.float32
    )


@functools.lru_cache(maxsize=None)
def _triu_ones_np(n: int):
    # numpy, not jnp: caching a traced array under lru_cache leaks tracers.
    return np.triu(np.ones((n, n), np.float32))


def _triu_ones(n: int):
    return jnp.asarray(_triu_ones_np(n))


@functools.lru_cache(maxsize=None)
def _tril_ones_np(n: int):
    return np.tril(np.ones((n, n), np.float32))


def _tril_ones(n: int):
    return jnp.asarray(_tril_ones_np(n))


def _pad_to(x: jnp.ndarray, m: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % m
    if pad:
        x = jnp.pad(x, (0, pad))
    return x


def cumsum_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D array via blocked MXU matmuls (fp32 accum)."""
    n = x.shape[0]
    if n <= _LANES:
        xp = _pad_to(x.astype(jnp.float32), _LANES)
        out = _dot_exact(xp[None, :], _triu_ones(_LANES))[0]
        return out[:n]
    xp = _pad_to(x.astype(jnp.float32), _LANES)
    rows = xp.shape[0] // _LANES
    m = xp.reshape(rows, _LANES)
    within = _dot_exact(m, _triu_ones(_LANES))
    totals = within[:, -1]
    carry = cumsum_f32(totals) - totals  # exclusive row offsets
    out = within + carry[:, None]
    return out.reshape(-1)[:n]


def cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact int32 inclusive cumsum (values must keep the total < 2^24)."""
    return cumsum_f32(x).astype(jnp.int32)


def cumsum_cols_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Column-wise inclusive cumsum along axis 0 of (N, C), blocked on the MXU.

    Same recursion as cumsum_f32 but batched over C independent columns:
    blocks of 128 rows scan via one broadcast (1,128,128) @ (nb,128,C)
    batched triangular matmul; block carries recurse on the per-block totals.
    """
    n, c = x.shape
    x = x.astype(jnp.float32)
    pad = (-n) % _LANES
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nb = x.shape[0] // _LANES
    xb = x.reshape(nb, _LANES, c)
    w = jnp.matmul(
        _tril_ones(_LANES)[None], xb, precision=_EXACT,
        preferred_element_type=jnp.float32,
    )  # (nb, 128, C) within-block inclusive
    if nb > 1:
        totals = w[:, -1, :]  # (nb, C)
        carry = cumsum_cols_f32(totals) - totals  # exclusive block offsets
        w = w + carry[:, None, :]
    return w.reshape(nb * _LANES, c)[:n]


def counting_sort_dest(digits: jnp.ndarray, c_width: int) -> jnp.ndarray:
    """Stable counting-sort destination of each element, by digit value.

    ``digits``: (K,) int32 in [0, c_width).  Returns (K,) int32 positions such
    that scattering x to dest orders x by digit, ties in original order — one
    LSD radix pass.  All counting rides blocked MXU cumsums (exact in fp32
    while K < 2^24); no gathers, no lax.sort, and (unlike the XLA TPU sort,
    whose compiled code grows with the input length) O(1) compiled code.
    """
    k = digits.shape[0]
    assert k < (1 << 24), "fp32 counting is exact only below 2^24 elements"
    cols = jnp.arange(c_width, dtype=jnp.int32)
    onehot = (digits[:, None] == cols[None, :]).astype(jnp.float32)  # (K, C)
    incl = cumsum_cols_f32(onehot)  # running per-digit counts
    totals = incl[-1]  # (C,)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(totals)[:-1]])
    # select own digit's column: dest = offs[digit] + (incl count - 1)
    dest = jnp.sum(onehot * (incl + (offs - 1.0)[None, :]), axis=1)
    return dest.astype(jnp.int32)


def radix_sort_u32(keys: jnp.ndarray, payloads, *, bits: int, digit_bits: int):
    """Stable LSD radix sort of uint32 keys with int32 payloads.

    Returns (keys_sorted, payloads_sorted).  Compiled-code-size-safe
    replacement for jax.lax.sort (see counting_sort_dest).
    """
    mask = jnp.uint32((1 << digit_bits) - 1)
    for shift in range(0, bits, digit_bits):
        d = ((keys >> jnp.uint32(shift)) & mask).astype(jnp.int32)
        dest = counting_sort_dest(d, 1 << digit_bits)
        keys = jnp.zeros_like(keys).at[dest].set(keys, mode="drop")
        payloads = [
            jnp.zeros_like(p).at[dest].set(p, mode="drop") for p in payloads
        ]
    return keys, payloads


def cummax_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cummax of a 1-D int32 array via blocked lane shifts."""
    n = x.shape[0]
    neg = jnp.iinfo(jnp.int32).min
    xp = _pad_to(x, _LANES)
    if xp.shape[0] == n == _LANES:
        pass
    rows = xp.shape[0] // _LANES
    m = xp.reshape(rows, _LANES)
    if n % _LANES:
        mask = jnp.arange(xp.shape[0], dtype=jnp.int32).reshape(rows, _LANES) < n
        m = jnp.where(mask, m, neg)
    shift = 1
    while shift < _LANES:
        sh = jnp.pad(m, ((0, 0), (shift, 0)), constant_values=neg)[:, :_LANES]
        m = jnp.maximum(m, sh)
        shift *= 2
    totals = m[:, -1]
    if rows > 1:
        carry_in = cummax_i32(totals)
        carry = jnp.concatenate([jnp.full((1,), neg, jnp.int32), carry_in[:-1]])
        m = jnp.maximum(m, carry[:, None])
    return m.reshape(-1)[:n]
