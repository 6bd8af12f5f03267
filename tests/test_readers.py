"""Scene readers on synthetic COLMAP-text and Nerfies dataset layouts
(reference: dataset_readers.py:253-312, 599-794; scene/__init__.py:43-54)."""

import json
import os

import numpy as np
from PIL import Image

from gs_deformable_tpu.data import readers


def build_colmap_scene(root, n_frames=6, size=32):
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(root, "sparse/0/cameras.txt"), "w") as f:
        f.write("# cams\n1 PINHOLE {0} {0} 40.0 40.0 16.0 16.0\n".format(size))
    with open(os.path.join(root, "sparse/0/images.txt"), "w") as f:
        f.write("# images\n")
        for i in range(n_frames):
            q = np.array([1.0, 0, 0, 0])
            t = [0.1 * i, 0.0, 4.0]
            f.write(f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 {i:04d}.png\n")
            f.write("1.0 1.0 -1\n")
            img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, "images", f"{i:04d}.png"))
    with open(os.path.join(root, "sparse/0/points3D.txt"), "w") as f:
        f.write("# pts\n")
        for i in range(20):
            p = rng.uniform(-1, 1, 3)
            f.write(f"{i+1} {p[0]} {p[1]} {p[2]} 100 150 200 0.5 1 1\n")
    return root


def test_colmap_reader(tmp_path):
    root = build_colmap_scene(str(tmp_path / "colmap"))
    info = readers.read_colmap_scene(root, eval=True, random_init_points=500)
    assert readers.detect_scene_type(root) == "Colmap"
    # llffhold=10: every 10th frame -> test
    assert len(info.test_cameras) == 1 and len(info.train_cameras) == 5
    # time = int(image_name) / num_cams (dataset_readers.py:106)
    times = sorted(c.time for c in info.train_cameras + info.test_cameras)
    np.testing.assert_allclose(times, [i / 6 for i in range(6)])
    # SfM cloud replaced by random bbox points (:291-299)
    assert info.point_cloud.points.shape[0] == 500
    assert os.path.exists(info.ply_path)
    assert info.nerf_normalization["radius"] > 0


def build_nerfies_scene(tmp_path, n=8, size=24):
    root = str(tmp_path / "hypernerf" / "scene1")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = [f"{i:06d}" for i in range(n)]
    with open(os.path.join(root, "scene.json"), "w") as f:
        json.dump({"scale": 0.5, "center": [0.1, 0.2, 0.3]}, f)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({i: {"camera_id": 0, "warp_id": k, "time_id": k}
                   for k, i in enumerate(ids)}, f)
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump({"ids": ids, "train_ids": ids[:-2], "val_ids": ids[-2:]}, f)
    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb/2x"), exist_ok=True)
    for i in ids:
        with open(os.path.join(root, "camera", f"{i}.json"), "w") as f:
            json.dump({
                "orientation": np.eye(3).tolist(),
                "position": [0.0, 0.0, -4.0],
                "focal_length": 60.0,
                "principal_point": [size, size],
                "skew": 0.0,
                "pixel_aspect_ratio": 1.0,
                "image_size": [2 * size, 2 * size],
            }, f)
        img = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "rgb/2x", f"{i}.png"))
    np.save(os.path.join(root, "points.npy"), rng.normal(size=(50, 3)))
    return root


def test_nerfies_reader(tmp_path):
    root = build_nerfies_scene(tmp_path)
    assert readers.detect_scene_type(root) == "nerfies"
    info = readers.read_nerfies_scene(root, eval=True, random_init_points=300)
    # trains on ALL ids (the reference override, dataset_readers.py:718)
    assert len(info.train_cameras) == 8
    # every 4th held out for test (:700-715)
    assert len(info.test_cameras) == 2
    # time = warp_id / max_warp (:643-647)
    times = [c.time for c in info.train_cameras]
    np.testing.assert_allclose(max(times), 1.0)
    np.testing.assert_allclose(min(times), 0.0)
    # npy points scaled/centered + 300 random augment
    assert info.point_cloud.points.shape[0] == 350


def test_blender_detect(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_scene import build_blender_scene

    root = build_blender_scene(str(tmp_path / "bl"), n_views=3, n_test=1, size=24)
    assert readers.detect_scene_type(root) == "Blender"
    info = readers.read_blender_scene(root, eval=True, random_init_points=100)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 1
    assert 0.0 <= info.train_cameras[0].time <= 1.0
