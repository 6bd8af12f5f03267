"""Scene container: dataset sniffing, camera lists, output-dir bookkeeping.

Re-design of /root/reference/scene/__init__.py:21-102 without torch: cameras
are host dataclasses, the gaussian state is created by the caller (the trainer
owns the jittable state), and model loading goes through io/model_ply.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Dict, List

from .cameras import Camera, camera_to_json, load_camera
from .readers import SceneInfo, detect_scene_type, scene_load_callbacks


class Scene:
    def __init__(
        self,
        source_path: str,
        model_path: str,
        images: str = "images",
        eval: bool = False,
        white_background: bool = False,
        shuffle: bool = True,
        resolution: int = -1,
        resolution_scales: List[float] = (1.0,),
        random_init_points: int = 100_000,
    ):
        self.model_path = model_path
        self.train_cameras: Dict[float, List[Camera]] = {}
        self.test_cameras: Dict[float, List[Camera]] = {}

        kind = detect_scene_type(source_path)
        if kind == "Colmap":
            info: SceneInfo = scene_load_callbacks[kind](
                source_path, images, eval, random_init_points=random_init_points
            )
        elif kind == "Blender":
            print("Found transforms_train.json file, assuming Blender data set!")
            info = scene_load_callbacks[kind](
                source_path, white_background, eval,
                random_init_points=random_init_points,
            )
        else:
            print("Found metadata.json, assuming Nerfies data set!")
            info = scene_load_callbacks[kind](
                source_path, eval, random_init_points=random_init_points
            )
        self.scene_info = info

        if model_path:
            # First-run artifacts (scene/__init__.py:56-68): input.ply + cameras.json
            os.makedirs(model_path, exist_ok=True)
            if os.path.exists(info.ply_path):
                shutil.copyfile(info.ply_path, os.path.join(model_path, "input.ply"))
            cam_json = []
            for idx, cam in enumerate(info.test_cameras + info.train_cameras):
                cam_json.append(camera_to_json(idx, cam))
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            train_list = list(info.train_cameras)
            test_list = list(info.test_cameras)
            random.shuffle(train_list)
            random.shuffle(test_list)
        else:
            train_list = info.train_cameras
            test_list = info.test_cameras

        self.cameras_extent = float(info.nerf_normalization["radius"])

        for scale in resolution_scales:
            print(f"Loading Training Cameras (scale {scale})")
            self.train_cameras[scale] = [
                load_camera(c, i, resolution, scale) for i, c in enumerate(train_list)
            ]
            print(f"Loading Test Cameras (scale {scale})")
            self.test_cameras[scale] = [
                load_camera(c, i, resolution, scale) for i, c in enumerate(test_list)
            ]

    def get_train_cameras(self, scale: float = 1.0) -> List[Camera]:
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0) -> List[Camera]:
        return self.test_cameras[scale]

    def point_cloud_dir(self, iteration: int) -> str:
        return os.path.join(self.model_path, f"point_cloud/iteration_{iteration}")
