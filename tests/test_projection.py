"""Preprocess (EWA projection) vs independent numpy matrix oracle
(reference: forward.cu:74-113, 156-256)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gs_deformable_tpu.ops import projection as proj
from gs_deformable_tpu.ops import transforms as tf


def make_camera(width=128, height=96, fovx=0.9, fovy=0.7, seed=1):
    rs = np.random.default_rng(seed)
    R = Rotation.random(random_state=seed).as_matrix()
    t = np.array([0.1, -0.2, 4.0])
    view = tf.world_to_view(R, t)
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    full = view @ projm
    return view, full, fovx, fovy, width, height


def numpy_cov2d_oracle(mean, cov3d6, view, fx, fy, tanx, tany):
    """Independent construction: cov2d = A Sigma_cam A^T with explicit matrices."""
    V3 = view[:3, :3].T  # math world->cam rotation (row conv storage)
    tvec = view[3, :3]
    tcam = V3 @ mean + tvec
    tx = np.clip(tcam[0] / tcam[2], -1.3 * tanx, 1.3 * tanx) * tcam[2]
    ty = np.clip(tcam[1] / tcam[2], -1.3 * tany, 1.3 * tany) * tcam[2]
    tz = tcam[2]
    A = np.array(
        [[fx / tz, 0, -fx * tx / tz**2], [0, fy / tz, -fy * ty / tz**2]]
    )
    xx, xy, xz, yy, yz, zz = cov3d6
    S = np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
    C = A @ V3 @ S @ V3.T @ A.T
    return np.array([C[0, 0] + 0.3, C[0, 1], C[1, 1] + 0.3])


def test_cov2d_matches_matrix_oracle(rng):
    view, full, fovx, fovy, W, H = make_camera()
    tanx, tany = np.tan(fovx / 2), np.tan(fovy / 2)
    fx, fy = W / (2 * tanx), H / (2 * tany)
    n = 64
    means = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(n, 3)) * 0.3 - 2)
    cov6 = np.asarray(tf.build_cov3d(jnp.asarray(s, jnp.float32), jnp.asarray(q, jnp.float32)))
    got = np.asarray(
        proj.compute_cov2d(
            jnp.asarray(means), jnp.asarray(cov6), jnp.asarray(view),
            fx, fy, tanx, tany,
        )
    )
    want = np.stack([numpy_cov2d_oracle(means[i], cov6[i], view, fx, fy, tanx, tany) for i in range(n)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_preprocess_center_gaussian():
    """An isotropic gaussian straight ahead projects to the image center with
    radius ceil(3 * sqrt(sigma2d)) and a consistent tile count."""
    W, H = 128, 96
    fovx = fovy = 0.8
    tan = np.tan(fovx / 2)
    view = np.eye(4, dtype=np.float32)  # identity pose, camera at origin
    projm = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    full = view @ projm
    z = 5.0
    means = jnp.asarray([[0.0, 0.0, z]], jnp.float32)
    sigma = 0.05
    cov6 = jnp.asarray([[sigma**2, 0, 0, sigma**2, 0, sigma**2]], jnp.float32)
    out = proj.preprocess(
        means, cov6, jnp.asarray(view), jnp.asarray(full),
        width=W, height=H, tan_fovx=tan, tan_fovy=tan * H / W,
    )
    assert bool(out.mask[0])
    np.testing.assert_allclose(out.depths[0], z, rtol=1e-5)
    np.testing.assert_allclose(out.means2d_pix[0, 0], (W - 1) / 2, atol=1e-3)
    np.testing.assert_allclose(out.means2d_pix[0, 1], (H - 1) / 2, atol=1e-3)
    fx = W / (2 * tan)
    var2d = (fx * sigma / z) ** 2 + 0.3
    # lambda1 = mid + sqrt(max(0.1, mid^2 - det)): the 0.1 floor is active for
    # isotropic gaussians (mid^2 == det), inflating the radius (forward.cu:230).
    want_radius = np.ceil(3 * np.sqrt(var2d + np.sqrt(0.1)))
    assert int(out.radii[0]) == int(want_radius)
    r = np.asarray(out.rect[0])
    assert int(out.tiles_touched[0]) == (r[2] - r[0]) * (r[3] - r[1])
    # Conic is the inverse covariance.
    np.testing.assert_allclose(out.conics[0, 0], 1 / var2d, rtol=1e-4)
    np.testing.assert_allclose(out.conics[0, 1], 0.0, atol=1e-6)


def test_preprocess_culls():
    W, H = 64, 64
    tan = np.tan(0.4)
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, 0.8, 0.8)
    full = view @ projm
    means = jnp.asarray(
        [[0, 0, 0.1],  # behind near plane -> cull (auxiliary.h:154)
         [0, 0, -3.0],  # behind camera -> cull
         [100.0, 0, 5.0],  # far outside frustum -> zero tiles
         [0, 0, 5.0]],  # visible
        jnp.float32,
    )
    cov6 = jnp.tile(jnp.asarray([[0.01, 0, 0, 0.01, 0, 0.01]], jnp.float32), (4, 1))
    out = proj.preprocess(
        means, cov6, jnp.asarray(view), jnp.asarray(full),
        width=W, height=H, tan_fovx=tan, tan_fovy=tan,
    )
    np.testing.assert_array_equal(np.asarray(out.mask), [False, False, False, True])
    np.testing.assert_array_equal(np.asarray(out.radii)[:3], 0)
    alive = jnp.asarray([True, True, True, False])
    out2 = proj.preprocess(
        means, cov6, jnp.asarray(view), jnp.asarray(full),
        width=W, height=H, tan_fovx=tan, tan_fovy=tan, alive=alive,
    )
    assert not bool(out2.mask[3])


def test_mark_visible():
    """Standalone visibility = the preprocess near cull (rasterize_points.cu:198)."""
    view = np.eye(4, dtype=np.float32)
    projm = tf.projection_matrix(0.01, 100.0, 0.8, 0.8)
    full = view @ projm
    means = jnp.asarray(
        [[0, 0, 0.1], [0, 0, -3.0], [100.0, 0, 5.0], [0, 0, 5.0], [0, 0, 0.2]],
        jnp.float32,
    )
    vis = proj.mark_visible(means, jnp.asarray(view), jnp.asarray(full))
    # Near-plane test only: the far-outside-frustum point IS "visible" here,
    # exactly as in the reference (NDC checks are dead code, auxiliary.h:154).
    np.testing.assert_array_equal(
        np.asarray(vis), [False, False, True, True, False]
    )
