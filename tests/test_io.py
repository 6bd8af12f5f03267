"""PLY / checkpoint roundtrips (reference: gaussian_model.py:891-1025,
train.py:685-697)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, DeformConfig
from gs_deformable_tpu.io import checkpoint as ckpt
from gs_deformable_tpu.io import model_ply
from gs_deformable_tpu.io.ply import (
    fetch_point_cloud,
    read_ply,
    store_point_cloud,
    write_ply,
)
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu import training


def test_point_cloud_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (100, 3))
    p = str(tmp_path / "pc.ply")
    store_point_cloud(p, xyz, rgb)
    pts, cols, normals = fetch_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=1.0)
    np.testing.assert_array_equal(normals, 0)


def test_model_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.uniform(size=(30, 3)).astype(np.float32)
    st = G.init_from_points(pts, cols, capacity=48, sh_degree=3)
    st = st.replace(
        f_rest=jnp.asarray(rng.normal(size=(48, 15, 3)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(48, 4)).astype(np.float32)),
    )
    d = str(tmp_path / "pc")
    cfg = Config(deform=DeformConfig(depth=2, width=16))
    ts = training.init_train_state(st, 0, cfg)
    nets = {"offset_model": ts.deform, **{k: v for k, v in ts.latent.items()}}
    model_ply.save_ply(
        d, st,
        nets={"offset_model": ts.deform, "offset_model_rot": ts.latent["rot"],
              "offset_model_scaling": ts.latent["scaling"],
              "opacity_mask": ts.latent["opacity_mask"],
              "shs_model": ts.latent["shs"]},
    )
    st2, deg = model_ply.load_ply(os.path.join(d, "point_cloud.ply"), 64, 3)
    assert deg == 3
    assert int(st2.num_alive) == 30
    alive = np.asarray(st.alive)
    for field in ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"]:
        a = np.asarray(getattr(st, field))[alive]
        b = np.asarray(getattr(st2, field))[np.asarray(st2.alive)]
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=field)
    # nets restore
    off2 = model_ply.load_net(os.path.join(d, "offset_model.npz"), ts.deform)
    for a, b in zip(jax.tree_util.tree_leaves(off2), jax.tree_util.tree_leaves(ts.deform)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    st = G.init_from_points(pts, cols, capacity=32, sh_degree=2)
    cfg = Config(deform=DeformConfig(depth=2, width=16))
    ts = training.init_train_state(st, 0, cfg)
    p = str(tmp_path / "ck" / "chkpnt_100.npz")
    ckpt.save_checkpoint(p, ts, 100)
    ts2, it = ckpt.load_checkpoint(p, ts)
    assert it == 100
    for a, b in zip(jax.tree_util.tree_leaves(ts), jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ascii_ply_read(tmp_path):
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n1 2 3 255 0 0\n4 5 6 0 255 0\n"
        )
    d = read_ply(p)
    np.testing.assert_allclose(d["x"], [1, 4])
    np.testing.assert_array_equal(d["green"], [0, 255])
