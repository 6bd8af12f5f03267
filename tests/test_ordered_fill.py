"""ops/pallas/ordered_fill.py: streamed prefix-fill / placement kernels.

Both modes must be bit-identical to the scatter(+cumsum) they replace across
empty, partial, dense, and OOB-heavy inputs (interpret mode on CPU; the
on-chip parity harness covers the real-TPU lowering).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gs_deformable_tpu.ops.pallas.ordered_fill import (
    ordered_place_i32,
    ordered_prefix_fill,
)


def _case(seed, n, K, frac_valid):
    rng = np.random.default_rng(seed)
    nval = int(n * frac_valid)
    pos = np.sort(rng.choice(max(K, 1), min(nval, K), replace=False)).astype(
        np.int32
    )
    nval = pos.shape[0]
    tail = K + 7 + np.arange(n - nval, dtype=np.int32)  # ascending OOB
    return np.concatenate([pos, tail]), nval


@pytest.mark.parametrize("mask_mode", ["twolevel", "flat"])
@pytest.mark.parametrize(
    "seed,n,K,frac",
    [(0, 500, 4096, 0.5), (1, 2000, 2000, 1.0), (2, 64, 8192, 0.0),
     (3, 3000, 1000, 0.3), (4, 1, 1, 1.0)],
)
def test_prefix_fill_bitwise(seed, n, K, frac, mask_mode):
    pos, nval = _case(seed, n, K, frac)
    rng = np.random.default_rng(seed + 100)
    delta = rng.integers(-1000, 1000, (n, 3)).astype(np.float32)
    out = np.asarray(
        ordered_prefix_fill(jnp.asarray(pos), jnp.asarray(delta), K,
                            mask_mode=mask_mode)
    )
    seg = np.zeros((K, 3), np.float32)
    ok = pos < K
    seg[pos[ok]] = delta[ok]
    ref = np.cumsum(seg, axis=0, dtype=np.float64).astype(np.float32)
    np.testing.assert_array_equal(out, ref.T)  # field-major (C, K) result


@pytest.mark.parametrize("mask_mode", ["twolevel", "flat"])
@pytest.mark.parametrize(
    "seed,n,K,frac",
    [(0, 500, 4096, 0.5), (1, 2000, 2000, 1.0), (2, 64, 8192, 0.0),
     (5, 2048, 600_000, 1.0)],
)
def test_place_bitwise(seed, n, K, frac, mask_mode):
    pos, nval = _case(seed, n, K, frac)
    rng = np.random.default_rng(seed + 200)
    vals = rng.integers(0, 1 << 20, n).astype(np.int32)
    out = np.asarray(ordered_place_i32(jnp.asarray(pos), jnp.asarray(vals), K,
                                       mask_mode=mask_mode))
    ref = np.zeros((K,), np.int32)
    ok = pos < K
    ref[pos[ok]] = vals[ok]
    np.testing.assert_array_equal(out, ref)
