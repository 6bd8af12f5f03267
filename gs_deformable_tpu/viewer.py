"""SIBR network-GUI bridge: interactive viewing during training.

Wire-compatible port of /root/reference/gaussian_renderer/network_gui.py:26-86:
a non-blocking TCP listener; each message is a 4-byte little-endian length
followed by UTF-8 JSON holding the viewer camera (resolution, fovs, view and
view-projection matrices flattened) plus training-control flags; the response
is the raw HxWx3 uint8 render followed by a length-prefixed source-path string.

The reference flips the view matrices' second and third columns' signs for its
viewer convention (network_gui.py:75-78) — reproduced here.
"""

from __future__ import annotations

import json
import socket
import traceback
from typing import Optional, Tuple

import numpy as np

_listener: Optional[socket.socket] = None
conn: Optional[socket.socket] = None
addr = None

host = "127.0.0.1"
port = 6009


def init(wish_host: str, wish_port: int) -> None:
    """network_gui.py:26-32."""
    global host, port, _listener
    host, port = wish_host, wish_port
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((host, port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect() -> None:
    """network_gui.py:34-41."""
    global conn, addr
    if _listener is None:
        return
    try:
        conn, addr = _listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read() -> dict:
    """network_gui.py:43-48."""
    messageLength = conn.recv(4)
    messageLength = int.from_bytes(messageLength, "little")
    message = conn.recv(messageLength)
    return json.loads(message.decode("utf-8"))


def send(message_bytes: Optional[bytes], verify: str) -> None:
    """network_gui.py:50-54."""
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


class MiniCamView(Tuple):
    pass


def receive():
    """network_gui.py:57-86 — returns (camera dict or None, do_training,
    convert_shs, compute_cov3d, keep_alive, scaling_modifier).

    The camera dict carries width/height/fovx/fovy/znear/zfar plus the
    row-vector world_view and full_proj matrices ready for the renderer.
    """
    global conn
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width != 0 and height != 0:
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            convert_shs = bool(message["shs_python"])
            compute_cov3d = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_modifier = message["scaling_modifier"]
            world_view = np.reshape(np.array(message["view_matrix"]), (4, 4))
            world_view[:, 1] = -world_view[:, 1]
            world_view[:, 2] = -world_view[:, 2]
            full_proj = np.reshape(np.array(message["view_projection_matrix"]), (4, 4))
            full_proj[:, 1] = -full_proj[:, 1]
            # Wire-compatible extension: the stock SIBR client sends no time
            # (the reference MiniCam carries none either, scene/cameras.py:60
            # — interactive views of a deformable scene are pinned to t=0);
            # a time-aware client may add a "time" field to scrub the
            # deformation, and absent ones keep the reference behavior.
            time_val = float(message.get("time", 0.0))
            camera = {
                "time": time_val,
                "width": width,
                "height": height,
                "fovx": fovx,
                "fovy": fovy,
                "znear": znear,
                "zfar": zfar,
                "world_view": world_view.astype(np.float32),
                "full_proj": full_proj.astype(np.float32),
                "camera_center": np.linalg.inv(world_view)[3, :3].astype(np.float32),
            }
        except Exception:
            print("")
            traceback.print_exc()
            raise
        return (
            camera, do_training, convert_shs, compute_cov3d, keep_alive,
            scaling_modifier,
        )
    else:
        return None, None, None, None, None, None


def image_to_bytes(img_chw: np.ndarray) -> memoryview:
    """clamp + byte conversion of train.py:139."""
    arr = np.clip(img_chw, 0.0, 1.0)
    return memoryview(
        np.ascontiguousarray((arr * 255).astype(np.uint8).transpose(1, 2, 0))
    )
