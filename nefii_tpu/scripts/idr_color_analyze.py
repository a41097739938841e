"""Debug tool: query the IDR radiance cache over a hemisphere of view dirs.

Equivalent of the reference scripts/idr_color_analyze.py:13-66: for chosen
pixels, trace the surface point and sweep the RenderingNetwork over a
hemisphere of outgoing directions, writing a polar color plot per pixel.

    python -m nefii_tpu.scripts.idr_color_analyze --conf ... \
        --data_split_dir ... --old_expdir ... --pixels 100,100 200,150
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from nefii_tpu.ops.sampling import rotate_to_normal
    from nefii_tpu.scripts.render import RenderRunner, add_argument
    from nefii_tpu.utils.camera import get_camera_params

    parser = argparse.ArgumentParser()
    parser = add_argument(parser)
    parser.add_argument("--pixels", nargs="+", default=["128,128"],
                        help="u,v pixel coordinates to analyse")
    parser.add_argument("--n_theta", type=int, default=16)
    parser.add_argument("--n_phi", type=int, default=64)
    opt = parser.parse_args(argv)
    opt.num_rays = -1

    runner = RenderRunner(**vars(opt))
    model, params = runner.model, runner.params
    ds = runner.dataset

    uv = np.array([[float(t) for t in p.split(",")] for p in opt.pixels], np.float32)
    pose = jnp.asarray(ds.pose_all[0][None])
    K = jnp.asarray(ds.intrinsics_all[0][None])
    rays, cam = get_camera_params(jnp.asarray(uv[None]), pose, K)

    imp = model.implicit_network
    p_imp = params["implicit_network"]
    res = model.ray_tracer(
        lambda x: imp.sdf(p_imp, x), cam, jnp.ones(len(uv), bool), rays
    )
    print("hit:", np.asarray(res.object_mask))

    # hemisphere of view dirs about each surface normal
    g = imp.gradient(p_imp, res.points)
    normals = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-6)

    theta = np.linspace(0.05, np.pi / 2 - 0.05, opt.n_theta)
    phi = np.linspace(0, 2 * np.pi, opt.n_phi, endpoint=False)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    local = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3).astype(np.float32)

    import imageio.v2 as imageio

    out_dir = runner.out_dir
    feats_all = imp(p_imp, res.points)[:, 1:] if model.feature_vector_size else None
    for i in range(len(uv)):
        dirs = rotate_to_normal(jnp.asarray(local), jnp.tile(normals[i][None], (len(local), 1)))
        pts = jnp.tile(res.points[i][None], (len(local), 1))
        nrm = jnp.tile(normals[i][None], (len(local), 1))
        feats = (
            jnp.tile(feats_all[i][None], (len(local), 1))
            if feats_all is not None else None
        )
        rgb = model.rendering_network(params["rendering_network"], pts, nrm, dirs, feats)
        img = np.asarray(rgb).reshape(opt.n_theta, opt.n_phi, 3)
        path = os.path.join(out_dir, f"idr_colors_px{i}.png")
        imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        print("wrote", path)


if __name__ == "__main__":
    main()
