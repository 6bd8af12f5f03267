"""ops/segsum.py: sort-based per-gaussian gradient reduction.

The "sort" VJP must agree with XLA's native gather-transpose scatter-add
(the "scatter" mode) to fp tolerance — duplicates, absent gaussians, and
padding slots pointing at gaussian 0 included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_deformable_tpu.ops.segsum import gather_splats_t, segment_sum_rows


@pytest.mark.parametrize(
    "seed,P,Kp",
    [(0, 97, 512), (1, 1000, 4096), (2, 8, 8), (3, 5, 4096), (4, 3, 1000)],
)
def test_segment_sum_matches_numpy(seed, P, Kp):
    rng = np.random.default_rng(seed)
    gid = rng.integers(0, P, Kp).astype(np.int32)
    # Heavy duplication of gaussian 0 (padding-slot behavior).
    gid[rng.uniform(size=Kp) < 0.3] = 0
    rows = rng.standard_normal((Kp, 16)).astype(np.float32)
    out = np.asarray(segment_sum_rows(jnp.asarray(rows), jnp.asarray(gid), P))
    ref = np.zeros((P, 16), np.float64)
    np.add.at(ref, gid, rows.astype(np.float64))
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_gather_vjp_sort_matches_scatter():
    rng = np.random.default_rng(3)
    P, Kp = 257, 2048
    gid = jnp.asarray(rng.integers(0, P, Kp).astype(np.int32))
    splats = jnp.asarray(rng.standard_normal((P, 16)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((16, Kp)).astype(np.float32))

    def run(mode):
        def f(s):
            return jnp.vdot(gather_splats_t(s, gid, mode), ct)

        return jax.grad(f)(splats)

    g_sort = run("sort")
    g_scat = run("scatter")
    np.testing.assert_allclose(
        np.asarray(g_sort), np.asarray(g_scat), rtol=0, atol=2e-4
    )


def test_gather_forward_is_plain_gather():
    rng = np.random.default_rng(4)
    P, Kp = 50, 256
    gid = jnp.asarray(rng.integers(0, P, Kp).astype(np.int32))
    splats = jnp.asarray(rng.standard_normal((P, 16)).astype(np.float32))
    out = gather_splats_t(splats, gid, "sort")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(splats)[gid].T)
