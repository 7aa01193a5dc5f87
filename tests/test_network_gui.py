"""SIBR remote-viewer bridge: loopback client speaking the reference wire
protocol (network_gui.py:43-55) against our server."""
import json
import math
import socket
import threading

import numpy as np
import pytest

from gs_icp_slam_tpu.viz.network_gui import NetworkGUI


def _request(w, h, fovx=1.2, fovy=1.0, view=None):
    if view is None:
        view = np.eye(4, dtype=np.float32)
    return {
        "resolution_x": w, "resolution_y": h, "train": True,
        "fov_y": fovy, "fov_x": fovx, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": [float(v) for v in view.reshape(-1)],
        "view_projection_matrix": [float(v) for v in
                                   np.eye(4).reshape(-1)],
    }


def _send_msg(sock, msg):
    raw = json.dumps(msg).encode("utf-8")
    sock.sendall(len(raw).to_bytes(4, "little") + raw)


def _recv_exact(sock, n):
    out = b""
    while len(out) < n:
        b = sock.recv(n - len(out))
        assert b, "server closed"
        out += b
    return out


def test_loopback_render_roundtrip():
    captured = {}

    def render_fn(w2c, w, h, fx, fy):
        captured.update(w2c=w2c, w=w, h=h, fx=fx, fy=fy)
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = 7  # recognizable payload
        return img

    gui = NetworkGUI(port=0, verify="vtest")
    try:
        cli = socket.create_connection(("127.0.0.1", gui.port), timeout=5)
        w, h = 100, 60
        view = np.eye(4, dtype=np.float32)
        view[3, :3] = [1.0, 2.0, 3.0]  # torch row-vector translation row
        _send_msg(cli, _request(w, h, view=view))

        # server side: poll until the request is served
        for _ in range(100):
            if gui.poll(render_fn, timeout=0.05):
                break
        img = np.frombuffer(_recv_exact(cli, w * h * 3),
                            np.uint8).reshape(h, w, 3)
        vlen = int.from_bytes(_recv_exact(cli, 4), "little")
        verify = _recv_exact(cli, vlen)
        assert verify == b"vtest"
        assert (img[:, :, 0] == 7).all() and (img[:, :, 1:] == 0).all()

        # conventions: fx from fovx; w2c = (sign-flipped M)^T
        assert captured["w"] == w and captured["h"] == h
        assert abs(captured["fx"] - w / (2 * math.tan(0.6))) < 1e-6
        m = view.copy()
        m[:, 1] *= -1
        m[:, 2] *= -1
        np.testing.assert_allclose(captured["w2c"], m.T)
        cli.close()
    finally:
        gui.close()


def test_zero_resolution_is_keepalive():
    gui = NetworkGUI(port=0, verify="x")
    try:
        cli = socket.create_connection(("127.0.0.1", gui.port), timeout=5)
        _send_msg(cli, _request(0, 0))
        served = False
        for _ in range(100):
            if gui.poll(lambda *a: pytest.fail("must not render"),
                        timeout=0.05):
                served = True
                break
        assert served
        vlen = int.from_bytes(_recv_exact(cli, 4), "little")
        assert _recv_exact(cli, vlen) == b"x"
        cli.close()
    finally:
        gui.close()


def test_map_render_fn_shapes():
    """make_map_render_fn crops the quantized canvas to the request."""
    import jax.numpy as jnp

    from gs_icp_slam_tpu.models import empty_map, map_params
    from gs_icp_slam_tpu.viz.network_gui import make_map_render_fn

    gmap = empty_map(256, 0)
    fn = make_map_render_fn(map_params(gmap), gmap.live, 0)
    img = fn(np.eye(4, dtype=np.float32), 70, 50, 80.0, 80.0)
    assert img.shape == (50, 70, 3) and img.dtype == np.uint8
