"""Network-GUI bridge protocol roundtrip (reference network_gui.py:26-86)."""

import json
import socket
import threading

import numpy as np

from gs_deformable_tpu import viewer


def test_viewer_protocol_roundtrip():
    viewer.init("127.0.0.1", 0)  # ephemeral port
    port = viewer._listener.getsockname()[1]

    msg = {
        "resolution_x": 8, "resolution_y": 6, "train": True,
        "fov_y": 0.7, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "time": 0.37,  # wire-compatible extension (absent => 0.0)
        "view_matrix": list(np.eye(4).flatten()),
        "view_projection_matrix": list(np.eye(4).flatten()),
    }
    received = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little"))
        c.sendall(payload)
        img = b""
        want = 8 * 6 * 3
        while len(img) < want:
            img += c.recv(want - len(img))
        received["img"] = img
        ln = int.from_bytes(c.recv(4), "little")
        received["verify"] = c.recv(ln).decode()
        c.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(100):
        viewer.try_connect()
        if viewer.conn is not None:
            break
    assert viewer.conn is not None
    cam, do_training, shs_py, cov_py, keep_alive, smod = viewer.receive()
    assert cam["width"] == 8 and cam["height"] == 6
    assert abs(cam["time"] - 0.37) < 1e-9
    assert do_training and keep_alive and smod == 1.0
    # y/z columns sign-flipped (network_gui.py:75-78)
    np.testing.assert_allclose(cam["world_view"][:, 1], [0, -1, 0, 0])
    img = np.random.default_rng(0).uniform(0, 1, (3, 6, 8)).astype(np.float32)
    viewer.send(viewer.image_to_bytes(img), "srcpath")
    t.join(timeout=5)
    assert len(received["img"]) == 8 * 6 * 3
    assert received["verify"] == "srcpath"
    viewer.conn.close()
    viewer.conn = None
    viewer._listener.close()
