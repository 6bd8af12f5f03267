"""COLMAP parsers: python vs native C++ on synthetic binary models
(wire formats of colmap_loader.py:83-270)."""

import struct

import numpy as np
import pytest

from gs_deformable_tpu.data import colmap
from gs_deformable_tpu.io import native


def write_points3d_bin(path, xyz, rgb, err, tracks=2):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz[i], *rgb[i].astype(int), err[i]))
            f.write(struct.pack("<Q", tracks))
            for t in range(tracks):
                f.write(struct.pack("<ii", t, t))


def write_cameras_bin(path, cams):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, model_id, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cid, model_id, w, h))
            f.write(struct.pack("<" + "d" * len(params), *params))


def write_images_bin(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, qvec, tvec, cam_id, name in images:
            f.write(struct.pack("<idddddddi", iid, *qvec, *tvec, cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for t in range(2):
                f.write(struct.pack("<ddq", 1.0 * t, 2.0 * t, t))


@pytest.fixture
def model(tmp_path, rng):
    n = 50
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 255, (n, 3)).astype(np.float64)
    err = rng.uniform(0, 1, n)
    write_points3d_bin(str(tmp_path / "points3D.bin"), xyz, rgb, err)
    cams = [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0])]
    write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    q = rng.normal(size=(3, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    imgs = [(i + 1, q[i], rng.normal(size=3), 1, f"{i:04d}.png") for i in range(3)]
    write_images_bin(str(tmp_path / "images.bin"), imgs)
    return tmp_path, xyz, rgb, err, cams, imgs


def test_python_parsers(model, monkeypatch):
    tmp_path, xyz, rgb, err, cams, imgs = model
    monkeypatch.setattr(native, "available", lambda: False)
    x, c, e = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(x, xyz)
    np.testing.assert_allclose(c, rgb)
    intr = colmap.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    assert intr[1].model == "PINHOLE" and intr[1].width == 640
    np.testing.assert_allclose(intr[1].params, cams[0][4])
    extr = colmap.read_extrinsics_binary(str(tmp_path / "images.bin"))
    assert len(extr) == 3
    np.testing.assert_allclose(extr[1].qvec, imgs[0][1])
    assert extr[2].name == "0001.png"
    assert extr[1].xys.shape == (2, 2)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_python(model, monkeypatch):
    tmp_path, *_ = model
    nat_pts = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    nat_intr = colmap.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    nat_extr = colmap.read_extrinsics_binary(str(tmp_path / "images.bin"))
    monkeypatch.setattr(native, "available", lambda: False)
    py_pts = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    py_intr = colmap.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    py_extr = colmap.read_extrinsics_binary(str(tmp_path / "images.bin"))
    for a, b in zip(nat_pts, py_pts):
        np.testing.assert_allclose(a, b)
    assert nat_intr[1].model == py_intr[1].model
    np.testing.assert_allclose(nat_intr[1].params, py_intr[1].params)
    for k in py_extr:
        np.testing.assert_allclose(nat_extr[k].qvec, py_extr[k].qvec)
        np.testing.assert_allclose(nat_extr[k].tvec, py_extr[k].tvec)
        assert nat_extr[k].name == py_extr[k].name


def test_qvec_rotmat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)
