"""Build a tiny Blender/D-NeRF-format dataset on disk for end-to-end tests.

Renders ground-truth views of a few colored gaussian blobs with the dense
oracle so the trainer has a consistent, learnable target, and writes
transforms_train.json / transforms_test.json with per-frame `time` fields
(the D-NeRF layout the reference's readNerfSyntheticInfo consumes)."""

import json
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image
from scipy.spatial.transform import Rotation

from gs_deformable_tpu.ops import projection as proj
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.rasterize_dense import rasterize_dense


def _look_at_c2w(angle: float, radius: float = 4.0):
    """Camera on a circle in the x-z plane looking at the origin (OpenGL
    convention: -z forward, y up) — like Blender dataset cameras."""
    eye = np.array([radius * np.sin(angle), 0.0, radius * np.cos(angle)])
    forward = -eye / np.linalg.norm(eye)  # toward origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    # OpenGL camera: x right, y up, z backward
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w


def build_blender_scene(
    root: str, n_views: int = 6, n_test: int = 2, size: int = 64,
    n_blobs: int = 12, animate: bool = True, seed: int = 0,
):
    rng = np.random.default_rng(seed)
    fovx = 0.8
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    centers = rng.uniform(-0.8, 0.8, (n_blobs, 3)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(0.2, 1.0, (n_blobs, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.6, 0.95, n_blobs), jnp.float32)
    sigma = 0.12

    def render_view(c2w_gl, t):
        c2w = c2w_gl.copy()
        c2w[:3, 1:3] *= -1  # to COLMAP convention, as the reader does
        w2c = np.linalg.inv(c2w)
        R = np.transpose(w2c[:3, :3])
        T = w2c[:3, 3]
        view = tf.world_to_view(R, T)
        projm = tf.projection_matrix(0.01, 100.0, fovx, fovx)
        full = view @ projm
        # animate: blobs translate with time
        offs = np.array([0.3 * t, -0.2 * t, 0.0], np.float32) if animate else 0.0
        means = centers + offs
        cov6 = jnp.tile(
            jnp.asarray([[sigma**2, 0, 0, sigma**2, 0, sigma**2]], jnp.float32),
            (n_blobs, 1),
        )
        pre = proj.preprocess(
            jnp.asarray(means), cov6, jnp.asarray(view), jnp.asarray(full),
            width=size, height=size, tan_fovx=np.tan(fovx / 2),
            tan_fovy=np.tan(fovx / 2),
        )
        out = rasterize_dense(
            pre.means2d_pix, pre.depths, pre.conics, opac, colors, pre.rect,
            pre.mask, jnp.zeros(3), width=size, height=size,
        )
        return np.clip(np.asarray(out.color), 0, 1)

    for split, count in [("train", n_views), ("test", n_test)]:
        frames = []
        for i in range(count):
            angle = 2 * np.pi * i / max(count, 1) * 0.25
            t = i / max(count - 1, 1)
            c2w = _look_at_c2w(angle)
            img = render_view(c2w, t)
            rgba = np.concatenate(
                [img.transpose(1, 2, 0), np.ones((size, size, 1))], -1
            )
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(root, split, f"r_{i}.png")
            )
            frames.append(
                {
                    "file_path": f"./{split}/r_{i}",
                    "time": t,
                    "transform_matrix": c2w.tolist(),
                }
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return root
