"""Tiny synthetic scene writer shared by the trainer integration tests and
the multi-process trainer driver: a lambertian sphere of radius 0.5 rendered
from cameras on a ring, written in the SceneDataset on-disk layout
(image/*.exr + mask/*.png + cam_dict_norm.json — reference
code/datasets/scene_dataset.py:18-60)."""

import json

import numpy as np


def make_sphere_scene(d, n_views=3, res=16):
    """Write an `n_views`-view `res`x`res` sphere scene under directory `d`
    (a pathlib.Path or str). Returns str(d)."""
    import os

    import imageio.v2 as imageio

    from nefii_tpu.utils import exr

    d = str(d)
    os.makedirs(os.path.join(d, "image"), exist_ok=True)
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    H = W = res
    f = res * 1.25
    cam = {}
    for i in range(n_views):
        ang = 1.2 * i
        eye = 2.0 * np.array([np.sin(ang), 0.0, -np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        C2W = np.eye(4)
        C2W[:3, 0], C2W[:3, 1], C2W[:3, 2], C2W[:3, 3] = right, up, fwd, eye
        W2C = np.linalg.inv(C2W)
        K = np.eye(4)
        K[0, 0] = K[1, 1] = f
        K[0, 2] = K[1, 2] = W / 2

        img = np.zeros((H, W, 3), np.float32)
        mask = np.zeros((H, W), np.uint8)
        light = np.array([0.5, 0.5, -0.7])
        light = light / np.linalg.norm(light)
        for v in range(H):
            for u in range(W):
                dir_cam = np.array([(u - W / 2) / f, (v - H / 2) / f, 1.0])
                dir_w = C2W[:3, :3] @ dir_cam
                dir_w /= np.linalg.norm(dir_w)
                b = dir_w @ eye
                c = eye @ eye - 0.25
                disc = b * b - c
                if disc > 0:
                    t = -b - np.sqrt(disc)
                    p = eye + t * dir_w
                    n = p / np.linalg.norm(p)
                    shade = max(0.0, n @ light)
                    img[v, u] = np.array([0.8, 0.5, 0.3]) * (0.2 + 0.8 * shade)
                    mask[v, u] = 255
        exr.write(os.path.join(d, "image", f"{i:03d}.exr"), img)
        imageio.imwrite(os.path.join(d, "mask", f"{i:03d}.png"), mask)
        cam[f"{i:03d}.exr"] = {
            "K": K.reshape(-1).tolist(),
            "W2C": W2C.reshape(-1).tolist(),
        }
    with open(os.path.join(d, "cam_dict_norm.json"), "w") as fjson:
        json.dump(cam, fjson)
    return d
