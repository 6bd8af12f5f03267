"""Camera and covariance math.

Conventions follow the reference exactly:

- ``world_to_view`` / ``projection_matrix`` reproduce
  /root/reference/utils/graphics_utils.py:38-71, *already transposed* the way
  ``scene/cameras.py:55-57`` stores them: points transform as row vectors,
  ``p_cam = [p, 1] @ world_view`` and ``p_clip = [p, 1] @ full_proj`` (matching
  the CUDA ``transformPoint4x4`` at auxiliary.h:68-77, which indexes the torch
  row-major buffer column-wise).

- ``quat_to_rotmat`` uses the (r, x, y, z) ordering and the *unnormalized*
  quaternion convention of the CUDA kernel (forward.cu:127-138): normalization
  is the caller's job (the model's rotation activation), and gradients flow
  through the raw formula — the same convention as backward.cu:338-340.

- ``build_cov3d`` computes Sigma = (S R)^T (S R) = R^T S^2 R exactly as
  forward.cu:118-152 (M = S * R with glm column-major means math M = R^T S ...
  verified equivalent to the reference python ``build_scaling_rotation``
  (general_utils.py:84-110) which forms L = R S and Sigma = L L^T).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (r, x, y, z) -> rotation matrix, batched.

    No normalization — matches forward.cu:127 (comment: quaternion deliberately
    not renormalized in-kernel) and general_utils.py:78-95 when fed unit quats.

    Args: q: (..., 4). Returns: (..., 3, 3).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z),
            2.0 * (x * y - r * z),
            2.0 * (x * z + r * y),
        ],
        axis=-1,
    )
    row1 = jnp.stack(
        [
            2.0 * (x * y + r * z),
            1.0 - 2.0 * (x * x + z * z),
            2.0 * (y * z - r * x),
        ],
        axis=-1,
    )
    row2 = jnp.stack(
        [
            2.0 * (x * z - r * y),
            2.0 * (y * z + r * x),
            1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """(activated) scale + quaternion -> upper-triangular 3D covariance.

    Sigma = L L^T with L = R @ diag(s)  (general_utils.py:97-110 and
    forward.cu:118-152; both reduce to R diag(s^2) R^T).

    Args: scaling (..., 3) positive scales; rotation (..., 4) quats.
    Returns: (..., 6) packed [xx, xy, xz, yy, yz, zz] (forward.cu:146-151).
    """
    # Expanded to scalar (batched 1-D) arithmetic: materializing (P, 3, 3)
    # intermediates forces padded tiled layouts on TPU (minor dims of 3) and
    # costs ~50x the roofline traffic; the expansion fuses into one pass.
    r, x, y, z = (rotation[..., i] for i in range(4))
    R = (
        (1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)),
        (2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)),
        (2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)),
    )
    s = scale_modifier * scaling
    L = [[R[a][j] * s[..., j] for j in range(3)] for a in range(3)]

    def sig(a, b):
        return L[a][0] * L[b][0] + L[a][1] * L[b][1] + L[a][2] * L[b][2]

    return jnp.stack(
        [sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)],
        axis=-1,
    )


def unpack_cov3d(cov6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) packed upper triangle -> (..., 3, 3) symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Camera matrices (host-side, numpy — built once per camera at load time).
# ---------------------------------------------------------------------------


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """getWorld2View2 (graphics_utils.py:38-49), then transposed to the
    row-vector convention of cameras.py:55.  Returns (4, 4) float32 such that
    ``p_cam = [p, 1] @ M``."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt).T.copy()


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective (graphics_utils.py:51-71), transposed to the
    row-vector convention of cameras.py:56. Returns (4, 4) float32."""
    tan_half_fovy = np.tan(fovy / 2)
    tan_half_fovx = np.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P).T.copy()


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * np.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * np.arctan(pixels / (2 * focal))


def camera_center_from_view(world_view: np.ndarray) -> np.ndarray:
    """cameras.py:58 — camera center is row 3 of the inverse of the (transposed)
    view matrix."""
    return np.linalg.inv(world_view)[3, :3]
