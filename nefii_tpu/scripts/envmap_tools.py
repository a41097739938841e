"""Offline envmap utilities: constant-map fitting and SG rotation.

Equivalents of the reference envmaps/fit_envmap_constant.py (resize envmap to
MxM constant light .npy) and envmaps/rotate_lightsg.py:44-64 (rotate SG lobes
by Euler angles and save + preview). CLI subcommands:

    python -m nefii_tpu.scripts.envmap_tools constant --envmap e.exr --size 64
    python -m nefii_tpu.scripts.envmap_tools rotate --sg sg_128.npy \
        --euler yxz --degrees 90 0 0
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def fit_envmap_constant(envmap: np.ndarray, size: int) -> np.ndarray:
    import cv2

    return cv2.resize(envmap, (size, size), interpolation=cv2.INTER_AREA).astype(
        np.float32
    )


def rotate_lightsg(lgtSGs: np.ndarray, rotation: np.ndarray) -> np.ndarray:
    """Rotate SG lobe directions by a 3x3 rotation matrix (reference :55-61)."""
    lobes = lgtSGs[:, :3] / (np.linalg.norm(lgtSGs[:, :3], axis=-1, keepdims=True) + 1e-8)
    lambdas = np.abs(lgtSGs[:, 3:4])
    mus = np.abs(lgtSGs[:, 4:])
    lobes_rot = lobes @ rotation.T
    return np.concatenate([lobes_rot, lambdas, mus], axis=-1).astype(np.float32)


def euler_rotation(order: str, degrees) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R

    return R.from_euler(order, degrees, degrees=True).as_matrix()


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("constant")
    pc.add_argument("--envmap", required=True)
    pc.add_argument("--size", type=int, default=64)
    pc.add_argument("--out", default=None)

    pr = sub.add_parser("rotate")
    pr.add_argument("--sg", required=True, help=".npy of [M,7] SGs")
    pr.add_argument("--euler", default="yxz")
    pr.add_argument("--degrees", type=float, nargs=3, default=[90, 0, 0])
    pr.add_argument("--out", default=None)
    pr.add_argument("--preview", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "constant":
        from nefii_tpu.utils import exr as exr_io

        env = exr_io.read(args.envmap)[:, :, :3]
        const = fit_envmap_constant(env, args.size)
        out = args.out or os.path.splitext(args.envmap)[0] + f"_const{args.size}.npy"
        np.save(out, const)
        print("saved", out, const.shape)
    else:
        lgt = np.load(args.sg)
        rot = euler_rotation(args.euler, args.degrees)
        lgt_rot = rotate_lightsg(lgt, rot)
        out = args.out or args.sg[:-4] + "_rot.npy"
        np.save(out, lgt_rot)
        print("saved", out)
        if args.preview:
            import imageio.v2 as imageio
            import jax.numpy as jnp

            from nefii_tpu.ops.sg import compute_envmap

            env = np.asarray(compute_envmap(jnp.asarray(lgt_rot), 256, 512))
            im = np.clip(np.power(np.clip(env, 0, None), 1 / 2.2), 0, 1)
            imageio.imwrite(out[:-4] + "_envmap.png", (im * 255).astype(np.uint8))


if __name__ == "__main__":
    main()
