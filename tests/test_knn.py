"""TPU k-NN vs exact brute force (reference: simple-knn/simple_knn.cu)."""

import numpy as np
import jax.numpy as jnp

from gs_deformable_tpu.ops.knn import (
    mean_sq_dist_knn3,
    mean_sq_dist_knn3_window,
    morton_codes,
)


def brute_mean_sq_3nn(pts):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    part = np.sort(d2, axis=1)[:, :3]
    return part.mean(1)


def test_knn_exact_matches_brute_force(rng):
    pts = rng.normal(size=(700, 3)).astype(np.float32)
    got = np.asarray(mean_sq_dist_knn3(jnp.asarray(pts), block=256))
    want = brute_mean_sq_3nn(pts)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_knn_with_duplicates(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pts = np.concatenate([pts, pts[:10]])  # exact duplicates
    got = np.asarray(mean_sq_dist_knn3(jnp.asarray(pts), block=64))
    want = brute_mean_sq_3nn(pts)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_knn_window_approximation(rng):
    pts = rng.uniform(size=(600, 3)).astype(np.float32)
    got = np.asarray(mean_sq_dist_knn3_window(jnp.asarray(pts), window=64))
    want = brute_mean_sq_3nn(pts)
    # The window variant can only miss true neighbors -> it overestimates.
    assert (got >= want - 1e-5).all()
    rel = np.abs(got - want) / np.maximum(want, 1e-12)
    assert np.median(rel) < 1e-5  # most points exact
    assert rel.mean() < 0.5


def test_morton_unique_on_grid():
    g = np.stack(np.meshgrid(*[np.linspace(0, 1, 8)] * 3), -1).reshape(-1, 3)
    codes = np.asarray(morton_codes(jnp.asarray(g, jnp.float32))).astype(np.int64)
    assert len(np.unique(codes)) == len(codes)
