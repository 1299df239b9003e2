"""COLMAP text-model IO: write a synthetic sparse model, load cameras."""

import os

import imageio.v2 as imageio
import numpy as np


def _quat_from_mat(m):
    qw = np.sqrt(max(1e-12, 1 + m[0, 0] + m[1, 1] + m[2, 2])) / 2
    return (
        qw,
        (m[2, 1] - m[1, 2]) / (4 * qw),
        (m[0, 2] - m[2, 0]) / (4 * qw),
        (m[1, 0] - m[0, 1]) / (4 * qw),
    )


def write_colmap_text_dataset(root, n_views=3, wh=(48, 40), f=60.0):
    w, h = wh
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    with open(os.path.join(root, "sparse", "0", "cameras.txt"), "w") as fh:
        fh.write(f"# cams\n1 PINHOLE {w} {h} {f} {f} {w / 2} {h / 2}\n")
    rng = np.random.default_rng(0)
    lines = ["# images"]
    poses = []
    for i in range(n_views):
        az = 2 * np.pi * i / n_views + 0.37  # avoid qw≈0 degeneracies
        c = np.array([2.5 * np.cos(az), 0.3, 2.5 * np.sin(az)])
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        rw2c = np.stack([x, y, z])
        t = -rw2c @ c
        qw, qx, qy, qz = _quat_from_mat(rw2c)
        name = f"frame{i:03d}.png"
        lines.append(
            f"{i + 1} {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 1 {name}"
        )
        lines.append("")
        imageio.imwrite(
            os.path.join(root, "images", name),
            (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8),
        )
        poses.append((rw2c, t))
    with open(os.path.join(root, "sparse", "0", "images.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "sparse", "0", "points3D.txt"), "w") as fh:
        fh.write("# 1 point\n7 0.1 0.2 0.3 200 100 50 0.5\n")
    return poses


def test_load_colmap_cameras_text(tmp_path):
    from youreditableavatar_tpu.models.cameras import load_colmap_cameras

    poses = write_colmap_text_dataset(str(tmp_path))
    cams = load_colmap_cameras(str(tmp_path))
    assert len(cams) == 3
    for cam, (rw2c, t) in zip(cams, poses):
        assert cam.width == 48 and cam.height == 40
        assert cam.image is not None and cam.image.shape == (40, 48, 3)
        # GSCamera.R is cam→world = w2c rotation transposed.
        np.testing.assert_allclose(cam.R, rw2c.T, atol=1e-5)
        np.testing.assert_allclose(cam.T, t, atol=1e-5)
        np.testing.assert_allclose(cam.fx, 60.0, atol=1e-6)


def test_load_sparse_points(tmp_path):
    from youreditableavatar_tpu.models.colmap import load_sparse_model

    write_colmap_text_dataset(str(tmp_path))
    _, _, (xyz, rgb) = load_sparse_model(str(tmp_path / "sparse" / "0"))
    assert xyz.shape == (1, 3)
    np.testing.assert_allclose(xyz[0], [0.1, 0.2, 0.3], atol=1e-6)
    assert tuple(rgb[0]) == (200, 100, 50)
