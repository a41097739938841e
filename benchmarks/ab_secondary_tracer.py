"""Long-horizon quality A/B (VERDICT r3 #6): exact reference secondary-ray
tracer vs the shipped reduced one (sphere_tracing_iters 10->5,
line_step_iters 3->0, n_steps 100->50, rootfind 32->16, sampler_budget 8192)
over 20k iterations, two seeds, on a synthetic multi-view NON-CONVEX scene
(blobby 3-sphere union -- secondary rays genuinely re-hit, so visibility +
indirect paths are active). Frozen Step-1-style geometry (the shipped
workflow), materials+light trained with pt_render_indirect_mlp + secondary
self-distillation every 10 iters. Reports held-out SG-render PSNR every 2000
iterations.

Usage: python ab.py <variant: exact|reduced|fused|bf16> <seed> <iters> <out.json>

The fused/bf16 variants reuse this harness for the bf16-trace A/B (VERDICT
r3 #4): both arms run the reduced secondary tracer + the fused Pallas SDF
kernel (the shipped confs/conf.conf default), differing ONLY in
fused_sdf_dtype (float32 vs bfloat16). TPU-only.
"""
import json
import sys
import time

import numpy as np

VARIANT, SEED, N_ITERS, OUT = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

import os

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                    # bench_fit, synthetic_scene
sys.path.insert(0, os.path.dirname(_HERE))   # nefii_tpu

import jax

from nefii_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup(jax)
import jax.numpy as jnp

from synthetic_scene import build_model, make_views, run_training  # noqa: E402


def main():
    H = W = 48
    n_views = 7  # 6 train + 1 held-out
    views = make_views(n_views, H, W)
    train_views, test_view = views[:-1], views[-1]

    model = build_model(VARIANT)

    # eval: full held-out view, sg render PSNR inside mask
    Kt, C2Wt, img_t, mask_t = test_view
    v, u = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    uv_all = np.stack([u, v], -1).reshape(1, -1, 2)

    @jax.jit
    def eval_render(params):
        out = model.forward(
            params,
            {"uv": jnp.asarray(uv_all),
             "object_mask": jnp.ones((1, H * W), bool),
             "intrinsics": jnp.asarray(Kt[None]),
             "pose": jnp.asarray(C2Wt[None])},
            jax.random.PRNGKey(0), training=False,
        )
        return out["sg_rgb_values"], out["network_object_mask"]

    def psnr_now(params):
        rgb, hit = eval_render(params)
        rgb = np.asarray(rgb).reshape(H, W, 3)
        m = mask_t & np.asarray(hit).reshape(H, W)
        if m.sum() == 0:
            return 0.0
        mse = float(np.mean((rgb[m] - img_t[m]) ** 2))
        return -10 * np.log10(max(mse, 1e-10))

    traj = []
    t_start = time.time()

    def on_eval(it, params, loss):
        p = psnr_now(params)
        traj.append([it, round(p, 3)])
        el = time.time() - t_start
        print(f"[{VARIANT} s{SEED}] it={it} loss={loss:.4f} "
              f"heldout_sg_psnr={p:.2f} dB elapsed={el/60:.1f}m", flush=True)
        json.dump({"variant": VARIANT, "seed": SEED, "traj": traj},
                  open(OUT, "w"))

    run_training(model, train_views, H, W, N_ITERS, SEED, eval_cb=on_eval)
    json.dump({"variant": VARIANT, "seed": SEED, "traj": traj, "done": True},
              open(OUT, "w"))


if __name__ == "__main__":
    main()
