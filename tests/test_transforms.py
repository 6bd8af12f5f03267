"""Camera/covariance math vs numpy + scipy oracles (reference:
utils/graphics_utils.py, utils/general_utils.py:64-110, forward.cu:118-152)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gs_deformable_tpu.ops import transforms as tf


def test_quat_to_rotmat_matches_scipy(rng):
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    got = np.asarray(tf.quat_to_rotmat(jnp.asarray(q, dtype=jnp.float32)))
    # scipy uses (x, y, z, w) ordering; reference uses (r=w, x, y, z).
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_build_cov3d_is_R_S2_Rt(rng):
    n = 32
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(n, 3)))
    got6 = np.asarray(tf.build_cov3d(jnp.asarray(s, jnp.float32), jnp.asarray(q, jnp.float32)))
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    want = np.einsum("nij,nj,nkj->nik", R, s**2, R)
    got = np.asarray(tf.unpack_cov3d(jnp.asarray(got6)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # eigenvalues are the squared scales
    for i in range(n):
        np.testing.assert_allclose(
            np.sort(np.linalg.eigvalsh(got[i])), np.sort(s[i] ** 2), rtol=1e-3
        )


def test_world_to_view_maps_points(rng):
    # p_cam = R_w2c (p - cam_center): check via an explicitly constructed pose.
    R = Rotation.random(random_state=0).as_matrix()
    t = rng.normal(size=3)
    M = tf.world_to_view(R, t)  # row-vector convention
    p = rng.normal(size=(5, 3))
    got = np.concatenate([p, np.ones((5, 1))], -1) @ M
    # Reference getWorld2View stores Rt[:3,:3] = R^T, Rt[:3,3] = t: cam = R^T p + t
    want = p @ R + t  # (R^T p)^T = p R
    np.testing.assert_allclose(got[:, :3], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:, 3], 1.0, atol=1e-6)
    # camera center: the world point mapping to the view-space origin.
    c = tf.camera_center_from_view(M)
    np.testing.assert_allclose(
        (np.concatenate([c, [1.0]]) @ M)[:3], 0.0, atol=1e-4
    )


def test_projection_matrix_frustum_corners():
    znear, zfar = 0.01, 100.0
    fovx, fovy = 0.8, 0.6
    P = tf.projection_matrix(znear, zfar, fovx, fovy)
    # A point on the +x frustum edge at depth z maps to ndc x = +1.
    z = 5.0
    x = np.tan(fovx / 2) * z
    hom = np.array([x, 0.0, z, 1.0]) @ P
    np.testing.assert_allclose(hom[0] / hom[3], 1.0, rtol=1e-5)
    # Depth mapping: znear -> 0, zfar -> 1 after divide.
    for z, want in [(znear, 0.0), (zfar, 1.0)]:
        hom = np.array([0, 0, z, 1.0]) @ P
        np.testing.assert_allclose(hom[2] / hom[3], want, atol=1e-5)


def test_fov_focal_roundtrip():
    for fov in [0.3, 0.8, 1.4]:
        f = tf.fov2focal(fov, 800)
        np.testing.assert_allclose(tf.focal2fov(f, 800), fov, rtol=1e-6)
