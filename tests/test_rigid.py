"""SE(3)/SO(3) exp maps vs scipy (reference: scene/rigid_body.py:16-100)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gs_deformable_tpu.ops import rigid


def test_exp_so3_matches_scipy(rng):
    n = 32
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0, np.pi, size=n)
    got = np.asarray(rigid.exp_so3(jnp.asarray(axis, jnp.float32), jnp.asarray(theta, jnp.float32)))
    want = Rotation.from_rotvec(axis * theta[:, None]).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_exp_se3_pure_translation(rng):
    # w -> 0 with v finite: exp_se3 should translate by theta * v.
    n = 8
    v = rng.normal(size=(n, 3)).astype(np.float32)
    w = np.tile(np.array([[1e-7, 0, 0]], np.float32), (n, 1))
    theta = np.ones(n, np.float32) * 0.7
    S = np.concatenate([w, v], -1)
    T = np.asarray(rigid.exp_se3(jnp.asarray(S), jnp.asarray(theta)))
    np.testing.assert_allclose(T[:, :3, :3], np.tile(np.eye(3), (n, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(T[:, :3, 3], 0.7 * v, rtol=1e-4, atol=1e-5)


def test_exp_se3_screw_consistency(rng):
    # A rigid transform applied to homogeneous points preserves distances.
    n = 16
    w = rng.normal(size=(n, 3))
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    v = rng.normal(size=(n, 3))
    theta = rng.uniform(0.1, 2.0, size=n)
    S = np.concatenate([w, v], -1).astype(np.float32)
    T = np.asarray(rigid.exp_se3(jnp.asarray(S), jnp.asarray(theta, jnp.float32)))
    p = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 3)).astype(np.float32)
    hp = np.asarray(rigid.to_homogenous(jnp.asarray(p)))
    hq = np.asarray(rigid.to_homogenous(jnp.asarray(q)))
    tp = np.einsum("nij,nj->ni", T, hp)
    tq = np.einsum("nij,nj->ni", T, hq)
    d0 = np.linalg.norm(p - q, axis=-1)
    d1 = np.linalg.norm(tp[:, :3] / tp[:, 3:] - tq[:, :3] / tq[:, 3:], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-3)
    # Rotation part matches exp_so3.
    R = np.asarray(rigid.exp_so3(jnp.asarray(w, jnp.float32), jnp.asarray(theta, jnp.float32)))
    np.testing.assert_allclose(T[:, :3, :3], R, atol=1e-5)
