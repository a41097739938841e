"""Fit a mixture of spherical Gaussians to an HDR environment map.

Equivalent of the reference envmaps/fit_envmap_with_sg.py:24-144 (Adam on
image MSE), as a proper CLI (the reference hardcodes dev paths) running the
optimisation in JAX on the accelerator. Saves `sg_<N>.npy` compatible with
`--light_sg_path` / `EnvmapMaterialNetwork.load_light`.

    python -m nefii_tpu.scripts.fit_envmap_with_sg --envmap env.exr \
        --num_sgs 128 --coordinate_type blender --n_iter 20000
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def fit_envmap_sg(
    gt_envmap: np.ndarray,
    num_sgs: int = 128,
    coordinate_type: str = "mitsuba",
    n_iter: int = 100_000,
    lr: float = 1e-2,
    init: np.ndarray = None,
    log_every: int = 0,
    out_dir: str = None,
    seed: int = 0,
):
    import jax
    import jax.numpy as jnp
    import optax

    from nefii_tpu.ops.sg import envmap_view_dirs, extract_light_sg, sg_fn

    H, W = gt_envmap.shape[:2]
    gt = jnp.asarray(gt_envmap, jnp.float32)
    viewdirs = envmap_view_dirs(H, W, coordinate_type=coordinate_type)

    if init is not None:
        lgtSGs = jnp.asarray(init, jnp.float32)
    else:
        lgtSGs = jax.random.normal(jax.random.PRNGKey(seed), (num_sgs, 7))
        lgtSGs = lgtSGs.at[:, 3:4].mul(100.0)

    def render(lgt):
        lobes, lambdas, mus = extract_light_sg(lgt)
        rgb = sg_fn(viewdirs[..., None, :], lobes, lambdas, mus)  # [H,W,M,3]
        return rgb.sum(-2)

    def loss_fn(lgt):
        return jnp.mean((render(lgt) - gt) ** 2)

    tx = optax.adam(lr)
    state = tx.init(lgtSGs)

    @jax.jit
    def step(lgt, state):
        loss, grads = jax.value_and_grad(loss_fn)(lgt)
        updates, state = tx.update(grads, state)
        return optax.apply_updates(lgt, updates), state, loss

    for it in range(n_iter):
        lgtSGs, state, loss = step(lgtSGs, state)
        if log_every and it % log_every == 0:
            print(f"step {it}: loss {float(loss):.6f}")
            if out_dir:
                _save_progress(np.asarray(lgtSGs), np.asarray(render(lgtSGs)),
                               gt_envmap, out_dir, num_sgs)

    return np.asarray(lgtSGs), float(loss_fn(lgtSGs))


def _save_progress(lgt, env, gt, out_dir, num_sgs):
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"sg_{num_sgs}.npy"), lgt)
    im = np.concatenate([gt, env], axis=0)
    im = np.clip(np.power(np.clip(im, 0, None), 1.0 / 2.2), 0, 1)
    imageio.imwrite(
        os.path.join(out_dir, f"log_im_{num_sgs}.png"), (im * 255).astype(np.uint8)
    )


def main(argv=None):
    from nefii_tpu.utils import exr as exr_io

    p = argparse.ArgumentParser()
    p.add_argument("--envmap", required=True, help="HDR envmap (.exr)")
    p.add_argument("--num_sgs", type=int, default=128)
    p.add_argument("--coordinate_type", default="mitsuba", choices=["mitsuba", "blender"])
    p.add_argument("--n_iter", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--resize", type=int, nargs=2, default=[256, 512], metavar=("H", "W"))
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)

    gt = exr_io.read(args.envmap)[:, :, :3]
    import cv2

    gt = cv2.resize(gt, (args.resize[1], args.resize[0]), interpolation=cv2.INTER_AREA)

    out_dir = args.out_dir or os.path.splitext(os.path.abspath(args.envmap))[0]
    os.makedirs(out_dir, exist_ok=True)

    init = None
    pretrained = os.path.join(out_dir, f"sg_{args.num_sgs}.npy")
    if os.path.isfile(pretrained):
        print("Loading:", pretrained)
        init = np.load(pretrained)

    lgt, loss = fit_envmap_sg(
        gt, args.num_sgs, args.coordinate_type, args.n_iter, args.lr,
        init=init, log_every=100, out_dir=out_dir,
    )
    _save_progress(lgt, gt * 0, gt, out_dir, args.num_sgs)
    print(f"final loss: {loss:.6f}; saved {pretrained}")


if __name__ == "__main__":
    main()
