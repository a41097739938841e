"""Relighting sweep: rotate the learned SG environment light and re-render.

Equivalent of the reference scripts/vis_rotate_envlight.py:252-377: rotates
the light-SG lobes in angle steps (mitsuba: yxz euler; blender: z axis) and
renders the first test view under each rotated light, writing per-step
renders and envmap previews.

    python -m nefii_tpu.scripts.vis_rotate_envlight --conf confs/conf.conf \
        --data_split_dir <scene_test> --old_expdir exps/robot --step_deg 15
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from nefii_tpu.scripts.envmap_tools import euler_rotation, rotate_lightsg
    from nefii_tpu.scripts.render import RenderRunner, add_argument

    parser = argparse.ArgumentParser()
    parser = add_argument(parser)
    parser.add_argument("--step_deg", type=float, default=15.0)
    parser.add_argument("--view_idx", type=int, default=0)
    opt = parser.parse_args(argv)

    runner = RenderRunner(**vars(opt))
    base_light = np.asarray(runner.params["envmap_material_network"]["lgtSGs"])
    out_root = runner.out_dir

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from nefii_tpu.ops.sg import compute_envmap
    from nefii_tpu.utils import exr as exr_io

    n_steps = int(round(360.0 / opt.step_deg))
    H, W = runner.dataset.img_res
    for i in range(n_steps):
        ang = i * opt.step_deg
        if opt.coordinate_type == "mitsuba":
            rot = euler_rotation("yxz", [ang, 0, 0])
        else:
            rot = euler_rotation("z", [ang])
        lgt_rot = rotate_lightsg(base_light, rot)

        params = dict(runner.params)
        mat = dict(params["envmap_material_network"])
        mat["lgtSGs"] = jnp.asarray(lgt_rot)
        params["envmap_material_network"] = mat
        runner.params = params

        out = runner.render_view(opt.view_idx)
        rgb = np.clip(out["sg_rgb_values"].reshape(H, W, 3), 0, 1)
        d = os.path.join(out_root, f"rot_{int(ang):03d}")
        os.makedirs(d, exist_ok=True)
        exr_io.write(os.path.join(d, "render.exr"), out["sg_rgb_values"].reshape(H, W, 3))
        imageio.imwrite(os.path.join(d, "render.png"), (rgb * 255).astype(np.uint8))

        env = np.asarray(
            compute_envmap(jnp.asarray(lgt_rot), 128, 256,
                           coordinate_type=opt.coordinate_type)
        )
        im = np.clip(np.power(np.clip(env, 0, None), 1 / 2.2), 0, 1)
        imageio.imwrite(os.path.join(d, "envmap.png"), (im * 255).astype(np.uint8))
        print(f"relit {int(ang)} deg -> {d}")


if __name__ == "__main__":
    main()
