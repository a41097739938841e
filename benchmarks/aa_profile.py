"""AA-render phase breakdown (VERDICT r3 #5 groundwork).

The production AA render (num_rays=256, fast_multi_ray) spends its time in
four places: primary trace (S rays), one-shade (features/normals/materials
at S points), the MC estimator math at S*R broadcast points, and the
secondary fan-out (3 strategies x S*R secondary rays: trace + visibility +
indirect MLP queries). This script separates them by timing ablated render
types that share the same compiled structure:

  sg                      trace + one-shade + closed-form SG     (no MC)
  pt_render               + MC sampler/BRDF math at S*R          (no secondary)
  pt_render_indirect_mlp  + secondary trace + vis/indirect MLPs  (the product)

and reports measured SDF-eval counts (TraceResult.n_evals, counted inside
the compiled step) to convert the dominant phase into sustained TFLOP/s for
the MXU-bound analysis. TPU-only. Usage: python aa_profile.py [out.json]
"""
import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

import jax

from nefii_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup(jax)
import jax.numpy as jnp

from bench import _exact_train_model, fit_representative_geometry  # noqa: E402

S, R, W = 512, 256, 512

# FLOP per value-only fused SDF eval (8x512 net + PE(6) input, last layer
# value column only) — the PARITY.md train-step accounting
SDF_MFLOP = 3.75
# visibility+indirect per secondary HIT: one SDF eval at the hit + one
# rendering-network eval (4x512 on [x,n,v,feat512] -> rgb) ~2.4 MFLOP + one
# SDF feature+grad for the hit normal/feature (fused fwd+input-bwd ~2x fwd)
VIS_IND_MFLOP = 3.75 + 2.4 + 7.5


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _HERE, "aa_profile_results.json")
    base = _exact_train_model()
    params = base.init_params(jax.random.PRNGKey(0))
    params = fit_representative_geometry(base, params)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = W * 1.2
    K[0, 2] = K[1, 2] = W / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.5]
    rng = np.random.RandomState(3)
    base_uv = rng.uniform(W * 0.3, W * 0.7, (1, S, 1, 2)).astype(np.float32)
    jitter = rng.uniform(-0.5, 0.5, (1, S, R, 2)).astype(np.float32)
    uv = jnp.asarray(base_uv + jitter)
    mask = jnp.ones((1, S), bool)
    Kj, posej = jnp.asarray(K[None]), jnp.asarray(pose[None])

    def timed(model, label):
        @jax.jit
        def render(params, uv, key):
            out = model.forward(
                params,
                {"uv": uv, "object_mask": mask, "intrinsics": Kj,
                 "pose": posej},
                key, training=False,
            )
            return out["sg_rgb_values"], out.get("n_sdf_evals", jnp.int32(0))

        rgb, ev = render(params, uv, jax.random.PRNGKey(0))
        rgb.block_until_ready()
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            rgb_i, ev = render(params, uv + i * 1e-4, jax.random.PRNGKey(10 + i))
            float(np.asarray(rgb_i).sum())
            times.append(time.perf_counter() - t0)
        times.sort()
        t = times[len(times) // 2]
        ev = int(np.asarray(ev))
        print(f"[{label:>24}] {t*1000:8.1f} ms  {S/t:7.1f} px/s  "
              f"sdf_evals={ev/1e6:.2f}M", flush=True)
        return t, ev

    results = {"S": S, "R": R}
    variants = {}
    # ladder: path_tracing = one-shade + MC math, NO secondary (2 strategies);
    # path_tracing_shadow = + secondary TRACE of 3xS*R rays (hard shadow, no
    # vis/indirect MLPs); pt_render_indirect_mlp = + vis/indirect MLP evals
    for rt in ("path_tracing", "path_tracing_shadow", "pt_render_indirect_mlp"):
        model = dc.replace(base, fast_multi_ray=True, render_type=rt)
        tr = dc.replace(model.ray_tracer, sampler_budget=1024, minsdf_budget=1024)
        model = dc.replace(model, ray_tracer=tr)
        t, ev = timed(model, rt)
        variants[rt] = {"s": t, "px_per_s": S / t, "sdf_evals": ev}

    # primary-trace-only timing (render_type "sg" can't stand in for it: the
    # flagship's per-point roughness violates render_with_sg's [K,1] base-
    # material contract, in the reference too — sg_render.py:168,177)
    from nefii_tpu.utils.camera import get_camera_params

    model = dc.replace(base, fast_multi_ray=True)
    tr = dc.replace(model.ray_tracer, sampler_budget=1024, minsdf_budget=1024)

    @jax.jit
    def trace_only(params, uv, key):
        ray_dirs, cam_loc = get_camera_params(
            jnp.mean(uv, axis=2), posej, Kj)
        sdf_fn = model._sdf_closure(params["implicit_network"])
        res = tr(sdf_fn, cam_loc, mask.reshape(-1), ray_dirs, key=key,
                 training=False,
                 sphere_trace_fn=model._fused_trace_closure(
                     params["implicit_network"], tr))
        return res.dists, res.n_evals

    d, ev = trace_only(params, uv, jax.random.PRNGKey(0))
    d.block_until_ready()
    tt = []
    for i in range(3):
        t0 = time.perf_counter()
        d, ev = trace_only(params, uv + i * 1e-4, jax.random.PRNGKey(10 + i))
        float(np.asarray(d).sum())
        tt.append(time.perf_counter() - t0)
    tt.sort()
    t_tr, ev_tr = tt[len(tt) // 2], int(np.asarray(ev))
    print(f"[{'primary_trace':>24}] {t_tr*1000:8.1f} ms  {S/t_tr:7.1f} px/s  "
          f"sdf_evals={ev_tr/1e6:.2f}M", flush=True)
    variants["primary_trace"] = {"s": t_tr, "px_per_s": S / t_tr,
                                 "sdf_evals": ev_tr}
    results["variants"] = variants

    t_full = variants["pt_render_indirect_mlp"]["s"]
    t_shadow = variants["path_tracing_shadow"]["s"]
    t_pt = variants["path_tracing"]["s"]
    ev_shadow = variants["path_tracing_shadow"]["sdf_evals"]
    ev_pt = variants["path_tracing"]["sdf_evals"]
    sec_trace_evals = ev_shadow - ev_pt
    n_sec = 3 * S * R
    results["phases"] = {
        "primary_trace_s": t_tr,
        "one_shade_mc_sampler_brdf_math_s": t_pt - t_tr,
        "secondary_trace_s": t_shadow - t_pt,
        "vis_indirect_mlp_s": t_full - t_shadow,
        "secondary_trace_sdf_evals": sec_trace_evals,
        "n_secondary_rays": n_sec,
    }
    # MXU accounting: the secondary trace phase is sec_trace_evals fused-SDF
    # matmuls; the vis/indirect phase is a dense fused fwd+input-grad SDF
    # eval + radiance-net eval at every secondary ray (3*S*R)
    tflop_trace = sec_trace_evals * SDF_MFLOP * 1e6 / 1e12
    tflop_visind = n_sec * VIS_IND_MFLOP * 1e6 / 1e12
    results["mxu"] = {
        "secondary_trace_tflop": round(tflop_trace, 2),
        "vis_indirect_tflop": round(tflop_visind, 2),
        "trace_sustained_tflops": round(tflop_trace / (t_shadow - t_pt), 1),
        "vis_indirect_sustained_tflops": round(
            tflop_visind / (t_full - t_shadow), 1),
    }
    print(json.dumps(results, indent=1))
    json.dump(results, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
