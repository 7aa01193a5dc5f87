"""Offline Scene loaders: COLMAP binary/text model round-trip against
fabricated fixtures, and the SLAM capture-directory reader."""
import os
import struct

import numpy as np
import pytest

from gs_icp_slam_tpu.datasets.scene import load_scene
from gs_icp_slam_tpu.io.colmap import (load_colmap_model, read_cameras_bin,
                                       read_images_bin, read_points3d_bin)


def _write_colmap_bin(d):
    os.makedirs(d, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    # images.bin: two images with 1 and 0 2D points
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))   # identity quat
        f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"a.png\x00")
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ddq", 10.0, 20.0, -1))
        f.write(struct.pack("<i", 8))
        q = np.array([np.cos(0.25), 0.0, np.sin(0.25), 0.0])
        f.write(struct.pack("<4d", *q))
        f.write(struct.pack("<3d", 0.0, 0.0, 1.0))
        f.write(struct.pack("<i", 1))
        f.write(b"b.png\x00")
        f.write(struct.pack("<Q", 0))
    # points3D.bin: two points
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid, xyz, rgb in ((1, (1.0, 2.0, 3.0), (10, 20, 30)),
                              (2, (4.0, 5.0, 6.0), (40, 50, 60))):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 7, 0))


def test_colmap_bin_roundtrip(tmp_path):
    d = str(tmp_path / "sparse" / "0")
    _write_colmap_bin(d)
    cams = read_cameras_bin(os.path.join(d, "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].fx == 500.0 and cams[1].fy == 510.0
    assert cams[1].cx == 320.0 and cams[1].cy == 240.0

    imgs = read_images_bin(os.path.join(d, "images.bin"))
    assert imgs[7].name == "a.png"
    T = imgs[7].w2c()
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], [0.1, 0.2, 0.3])
    # rotation about y by 0.5 rad for image 8
    T2 = imgs[8].w2c()
    np.testing.assert_allclose(T2[0, 0], np.cos(0.5), atol=1e-12)

    xyz, rgb = read_points3d_bin(os.path.join(d, "points3D.bin"))
    np.testing.assert_allclose(xyz, [[1, 2, 3], [4, 5, 6]])
    assert (rgb == [[10, 20, 30], [40, 50, 60]]).all()


def test_colmap_text_matches_binary(tmp_path):
    d = str(tmp_path / "sparse" / "0")
    _write_colmap_bin(d)
    cams_b, imgs_b, xyz_b, _ = load_colmap_model(d)
    # write the equivalent text model
    dt = str(tmp_path / "txt")
    os.makedirs(dt)
    with open(os.path.join(dt, "cameras.txt"), "w") as f:
        f.write("# comment\n1 PINHOLE 640 480 500 510 320 240\n")
    with open(os.path.join(dt, "images.txt"), "w") as f:
        f.write("7 1 0 0 0 0.1 0.2 0.3 1 a.png\n\n")
    with open(os.path.join(dt, "points3D.txt"), "w") as f:
        f.write("1 1 2 3 10 20 30 0.5 7 0\n2 4 5 6 40 50 60 0.5 7 0\n")
    cams_t, imgs_t, xyz_t, rgb_t = load_colmap_model(dt)
    assert cams_t[1].fx == cams_b[1].fx
    np.testing.assert_allclose(imgs_t[7].w2c(), imgs_b[7].w2c())
    np.testing.assert_allclose(xyz_t[0], xyz_b[0])


def test_scene_auto_dispatch_colmap(tmp_path):
    root = tmp_path / "capture"
    _write_colmap_bin(str(root / "sparse" / "0"))
    (root / "images").mkdir()
    info = load_scene(str(root))
    assert len(info.cameras) == 2
    assert info.cameras[0].width == 640
    assert info.points_xyz.shape == (2, 3)


def test_scene_slam_directory(tmp_path):
    from PIL import Image

    root = tmp_path / "run"
    (root / "images").mkdir(parents=True)
    (root / "depth_images").mkdir()
    with open(root / "caminfo.txt", "w") as f:
        f.write("# c\n# c\n64 48 60 60 31.5 23.5 1000.0 8.0 replica\n")
    for i in range(3):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
            root / "images" / f"frame{i:04d}.jpg")
        Image.fromarray(np.full((48, 64), 1000, np.uint16)).save(
            root / "depth_images" / f"depth{i:04d}.png")
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 0, 3] = [0.0, 0.1, 0.2]
    np.save(root / "poses.npy", poses)

    info = load_scene(str(root))
    assert len(info.cameras) == 3
    c = info.cameras[1]
    assert c.depth_path is not None and c.depth_scale == 1000.0
    # w2c = inv(c2w): translation flips sign for identity rotation
    np.testing.assert_allclose(c.w2c[0, 3], -0.1, atol=1e-12)


def _write_png(path, w=8, h=6):
    """Minimal valid PNG header (the blender reader only parses IHDR)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (3 * w) for _ in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_scene_blender_directory(tmp_path):
    """NeRF-synthetic reader parity (sceneLoadTypeCallbacks['Blender'],
    reference dataset_readers.py:384,420-423): transforms_train.json ->
    CameraInfo with the OpenGL->COLMAP axis flip, fov->focal, and the
    deterministic random init cloud."""
    import json

    d = tmp_path / "lego"
    d.mkdir()
    (d / "train").mkdir()
    # c2w: camera at z=+2 looking toward origin in Blender axes
    c2w = np.eye(4)
    c2w[2, 3] = 2.0
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "./train/r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(d / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    _write_png(str(d / "train" / "r_0.png"), w=8, h=6)

    info = load_scene(str(d))  # auto-dispatch via transforms_train.json
    assert len(info.cameras) == 1
    cam = info.cameras[0]
    assert (cam.width, cam.height) == (8, 6)
    # fx = W / (2 tan(fovx/2))
    np.testing.assert_allclose(cam.fx, 8 / (2 * np.tan(0.4)), rtol=1e-6)
    assert cam.fy == cam.fx
    # axis flip: blender c2w with +z position, y-up becomes a w2c whose
    # rotation flips y and z; translation moves camera to origin
    expect_w2c = np.linalg.inv(c2w @ np.diag([1.0, -1.0, -1.0, 1.0]))
    np.testing.assert_allclose(cam.w2c, expect_w2c, atol=1e-12)
    # no points3d.ply -> deterministic random init cloud in [-1.3, 1.3]
    assert info.points_xyz is not None and len(info.points_xyz) == 100_000
    assert np.all(np.abs(info.points_xyz) <= 1.3)
    info2 = load_scene(str(d), kind="blender")
    np.testing.assert_array_equal(info.points_xyz, info2.points_xyz)


def test_blender_white_background_composites_alpha(tmp_path):
    """RGBA NeRF-synthetic images alpha-composite onto the requested
    background at load (reference readCamerasFromTransforms bakes
    rgb*a + bg*(1-a) at read time, dataset_readers.py:342-366)."""
    import json

    from PIL import Image

    from gs_icp_slam_tpu.datasets.scene import load_camera_image

    d = tmp_path / "ship"
    d.mkdir()
    (d / "train").mkdir()
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "./train/r_0",
                        "transform_matrix": np.eye(4).tolist()}]}
    with open(d / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    # half-transparent pure-red RGBA image
    rgba = np.zeros((6, 8, 4), np.uint8)
    rgba[..., 0] = 200
    rgba[..., 3] = 128
    Image.fromarray(rgba).save(str(d / "train" / "r_0.png"))

    white = load_scene(str(d), kind="blender", white_background=True)
    black = load_scene(str(d), kind="blender", white_background=False)
    assert white.cameras[0].bg_color == (1.0, 1.0, 1.0)
    assert black.cameras[0].bg_color == (0.0, 0.0, 0.0)

    a = 128.0 / 255.0
    img_w = load_camera_image(white.cameras[0])
    img_b = load_camera_image(black.cameras[0])
    assert img_w.shape == (6, 8, 3) and img_w.dtype == np.uint8
    # red channel: rgb*a + bg*(1-a); green/blue: bg*(1-a)
    np.testing.assert_allclose(img_w[0, 0],
                               [round(200 * a + 255 * (1 - a)),
                                round(255 * (1 - a)), round(255 * (1 - a))],
                               atol=1)
    np.testing.assert_allclose(img_b[0, 0], [round(200 * a), 0, 0], atol=1)
