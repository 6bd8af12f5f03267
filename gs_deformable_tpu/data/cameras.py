"""Camera containers: host-side metadata + device-ready matrices.

Replaces scene/cameras.py:17-71 and utils/camera_utils.py:20-61.  A Camera is a
plain dataclass of numpy arrays (no torch modules); the jitted render step
takes the matrices as arrays.  Image pixels live in host memory as float32
(C, H, W) in [0, 1] and are shipped to the device by the training loop's input
pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np

from ..ops import transforms as tf

WARNED_LARGE = [False]


class CameraInfo(NamedTuple):
    """Reader output record (dataset_readers.py:27-38), incl. the `time` field."""

    uid: int
    R: np.ndarray
    T: np.ndarray
    fovx: float
    fovy: float
    image: "object"  # PIL image (lazily decoded by loadCam)
    image_path: str
    image_name: str
    width: int
    height: int
    time: float


@dataclasses.dataclass
class Camera:
    """Device-ready camera (scene/cameras.py:17-58 semantics)."""

    uid: int
    colmap_id: int
    image_name: str
    width: int
    height: int
    fovx: float
    fovy: float
    time: float
    world_view: np.ndarray  # (4, 4) row-vector convention
    full_proj: np.ndarray  # (4, 4)
    camera_center: np.ndarray  # (3,)
    image: Optional[np.ndarray]  # (3, H, W) float32 in [0, 1], or None (MiniCam)
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def tan_fovx(self) -> float:
        return float(np.tan(self.fovx * 0.5))

    @property
    def tan_fovy(self) -> float:
        return float(np.tan(self.fovy * 0.5))


def _resolve_resolution(width: int, height: int, resolution: int, scale: float):
    """loadCam's divisor logic (camera_utils.py:26-50): -1 auto-downscales
    images wider than 1600px; {1,2,4,8} divide; other values are a target width."""
    if resolution in (1, 2, 4, 8):
        return round(width / (scale * resolution)), round(height / (scale * resolution))
    if resolution == -1:
        if width > 1600:
            if not WARNED_LARGE[0]:
                print(
                    "[ INFO ] Encountered quite large input images (>1.6K pixels "
                    "width), rescaling to 1.6K.\n If this is not desired, please "
                    "explicitly specify '--resolution/-r' as 1"
                )
                WARNED_LARGE[0] = True
            global_down = width / 1600
        else:
            global_down = 1
        s = global_down * scale
        return int(width / s), int(height / s)
    # explicit target width
    global_down = width / resolution
    s = global_down * scale
    return int(width / s), int(height / s)


def load_camera(
    info: CameraInfo,
    uid: int,
    resolution: int = -1,
    resolution_scale: float = 1.0,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """loadCam + Camera construction (camera_utils.py:20-53, cameras.py:17-58).

    Resizes the PIL image, converts to float32 (3, H, W) in [0, 1] with the
    alpha channel (if any) multiplied in (cameras.py:45-48), and builds the
    transposed view/projection matrices.
    """
    w, h = _resolve_resolution(info.width, info.height, resolution, resolution_scale)
    arr = None
    if info.image is not None:
        img = info.image.resize((w, h))
        data = np.asarray(img, dtype=np.float32) / 255.0
        if data.ndim == 2:
            data = data[:, :, None].repeat(3, axis=2)
        rgb = np.clip(data[:, :, :3], 0.0, 1.0)
        if data.shape[2] == 4:
            rgb = rgb * data[:, :, 3:4]
        arr = np.transpose(rgb, (2, 0, 1)).copy()

    world_view = tf.world_to_view(info.R, info.T)
    proj = tf.projection_matrix(znear, zfar, info.fovx, info.fovy)
    full_proj = world_view @ proj
    center = tf.camera_center_from_view(world_view)
    return Camera(
        uid=uid,
        colmap_id=info.uid,
        image_name=info.image_name,
        width=w,
        height=h,
        fovx=info.fovx,
        fovy=info.fovy,
        time=float(info.time),
        world_view=world_view.astype(np.float32),
        full_proj=full_proj.astype(np.float32),
        camera_center=center.astype(np.float32),
        image=arr,
        znear=znear,
        zfar=zfar,
    )


def camera_to_json(uid: int, cam: CameraInfo) -> dict:
    """camera_to_JSON (camera_utils.py:63-83)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": uid,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": tf.fov2focal(cam.fovy, cam.height),
        "fx": tf.fov2focal(cam.fovx, cam.width),
    }
