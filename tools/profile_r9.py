"""Round-2 job 7: the backward's per-gaussian reduction under round-2 costs.

The VJP of the sorted-splat gather (rasterize.py:126) is an XLA scatter-ADD
of (Kp, 16) gradient rows onto (P, 16) with DUPLICATE gaussian indices.
Round-2 scatters cost ~40 ns/row on .set regardless of hints (profile_r8);
this measures whether .add shares that fate and times the sort-based
replacement (1-key gid sort -> monotone row gather -> MXU cumsum ->
boundary diff), stage by stage, at the bench train and render scales.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.ops.binning import tile_bounds_via_sort
from gs_deformable_tpu.ops.scan_utils import cumsum_cols_f32

ITERS = 10


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(carry * 0.0, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    try:
        t0 = time.time()
        float(loop(args))
        compile_s = time.time() - t0
        t0 = time.time()
        float(loop(args))
    except Exception as e:
        print(f"{name:52s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        return None
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def run_scale(tag, P, Kp, rng):
    # Realistic duplicate distribution: ~35k distinct gaussians, heavy-tailed
    # instance counts (like a real frame's tile expansion).
    n_emit = 35_000
    w = rng.pareto(1.2, n_emit) + 1.0
    w = w / w.sum()
    counts = rng.multinomial(Kp, w)
    gid_np = np.repeat(rng.choice(P, n_emit, replace=False).astype(np.int32),
                       counts)
    rng.shuffle(gid_np)  # tile-layout order is gid-arbitrary
    gid = jnp.asarray(gid_np)
    rows = jnp.asarray(rng.standard_normal((Kp, 16)), jnp.float32)

    def f_scatter_add(c, g, r):
        out = jnp.zeros((P, 16), jnp.float32).at[g].add(r + c)
        return out[0, 0]
    timeit(f"[{tag}] scatter-ADD dup rows (Kp={Kp})", f_scatter_add, gid, rows)

    pos = jnp.arange(Kp, dtype=jnp.int32)

    def f_sort(c, g):
        gs, ps = jax.lax.sort((g + (c * 0.0).astype(jnp.int32), pos),
                              num_keys=1, is_stable=True)
        return (gs[0] + ps[0]).astype(jnp.float32)
    timeit(f"[{tag}] 1-key gid sort + pos payload", f_sort, gid)

    perm = jnp.asarray(rng.permutation(Kp).astype(np.int32))

    def f_gather(c, r, p):
        return (r + c)[p][0, 0]
    timeit(f"[{tag}] row gather (Kp,16)[perm]", f_gather, rows, perm)

    def f_cumsum(c, r):
        return cumsum_cols_f32(r + c)[0, 0]
    timeit(f"[{tag}] cumsum_cols (Kp,16)", f_cumsum, rows)

    def f_bounds(c, g):
        b = tile_bounds_via_sort(g + (c * 0.0).astype(jnp.int32), P)
        return b[0].astype(jnp.float32)
    timeit(f"[{tag}] bounds via sort (T=P)", f_bounds, gid)

    def f_full(c, g, r):
        gs, ps = jax.lax.sort((g, pos), num_keys=1, is_stable=True)
        rs = (r + c)[ps]
        cs = cumsum_cols_f32(rs)
        b = tile_bounds_via_sort(gs, P)
        csz = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), cs], axis=0)
        out = csz[b[1:]] - csz[b[:-1]]
        return out[0, 0]
    timeit(f"[{tag}] FULL sort-based segsum", f_full, gid, rows)


def main():
    rng = np.random.default_rng(0)
    timeit("loop overhead (empty body)", lambda c: c + 1.0)
    P = 131_072
    run_scale("train", P, 442_368, rng)
    run_scale("render", P, 1_245_184, rng)


if __name__ == "__main__":
    main()
