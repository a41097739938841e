"""Decomposition-recovery benchmark: does Step-2 training actually separate
albedo from light?

Trains the shipped Step-2 recipe (pt_render_indirect_mlp + secondary
self-distillation, frozen Step-1-style geometry) on the scene-v2 synthetic
blobby (see synthetic_scene.py): known per-sphere diffuse albedos, a known
2-lobe SG-mixture light — the model family's OWN light parameterization
(reference sg_envmap_material.py:126-157), so the ground truth is inside
the hypothesis class — with MC-integrated penumbras and one-bounce
interreflection. Reports ground-truth-anchored numbers no novel-view PSNR
can fake:

1. heldout_sg_psnr  — novel-view re-render quality (sanity anchor, bounds
   every other score from above).
2. albedo           — recovered diffuse albedo vs the analytic per-sphere
   albedos at surface sample points, after the per-channel median scale
   alignment evaluate.py applies (reference scripts/evaluate.py:164-171;
   inverse rendering has a global light<->albedo scale ambiguity).
   Also a per-sphere-scalar-aligned hue variant and the per-sphere
   brightness ratios themselves (spread == regional shading baked into
   albedo).
3. relight          — the decomposition test proper: rotate the RECOVERED
   light SGs by R (scripts/envmap_tools.rotate_lightsg, reference
   envmaps/rotate_lightsg.py:44-64), re-render the held-out view, compare
   against the analytic scene re-rendered under the SAME rotated light.
   A model that baked shading into albedo renders the original image, not
   the relit one, and fails this gate (relight_control = the unrotated
   render scored against the relit GT).
4. relight_structural_bound — the reference family's indirect radiance
   comes from the IDR radiance cache, which encodes the ORIGINAL lighting
   and is not relightable (structural: its vis_rotate_envlight sweeps share
   this). The bound quantifies what that costs a PERFECT decomposition:
   PSNR between the fully-relit GT and a hybrid GT whose direct term is
   relit but whose indirect bounce still uses the original light. Any
   relight score is capped by min(bound, heldout fidelity).

Variants: reduced|exact|fused|bf16 select the secondary tracer / fused-SDF
knobs (see synthetic_scene.build_model); "oracle" = bf16 arm with the light
INITIALIZED TO GROUND TRUTH AND FROZEN — the diagnostic ladder rung that
separates light-estimation error from shading-model error in the albedo
score; "oracle_init" = GT light init but TRAINABLE (the reference's
--light_sg_path warm-start workflow) — whether it holds or drifts
separates an optimization-landscape failure (bad light MODES from random
init) from a supervision failure (the objective itself pulls light away
from truth).

Usage: python decomposition_recovery.py <iters> <seed> <out.json> \
           [res] [views] [variant: reduced|exact|fused|bf16|oracle|oracle_init]
"""
import json
import os
import sys
import time

import numpy as np

N_ITERS, SEED, OUT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
RES = int(sys.argv[4]) if len(sys.argv) > 4 else 64
N_VIEWS = int(sys.argv[5]) if len(sys.argv) > 5 else 13  # train = views - 1
VARIANT = sys.argv[6] if len(sys.argv) > 6 else "reduced"

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                    # bench_fit, synthetic_scene
sys.path.insert(0, os.path.dirname(_HERE))   # nefii_tpu

import jax

from nefii_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup(jax)
import jax.numpy as jnp

from nefii_tpu.scripts.envmap_tools import rotate_lightsg  # noqa: E402
from synthetic_scene import (  # noqa: E402
    ALBEDOS, CENTERS, RADII, SG_LIGHTS, build_model, make_views_sg,
    render_gt_sg, rotate_sg_lights, sdf_np, sg_lights_as_lgtSGs, run_training,
)

H = W = RES
RELIGHT_DEG = 50.0  # rotation about the world y axis


def rot_y(deg):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def masked_psnr(pred, gt, m):
    if m.sum() == 0:
        return 0.0
    mse = float(np.mean((pred[m] - gt[m]) ** 2))
    return -10 * np.log10(max(mse, 1e-10))


def _visible_from_any(p, n, eyes):
    """Occlusion-checked visibility of surface points from >=1 camera eye.
    Albedo at never-observed points is unsupervised — scoring it would
    measure extrapolation, not decomposition."""
    from synthetic_scene import march_blocked

    vis = np.zeros(len(p), bool)
    for e in eyes:
        d = e - p
        dist = np.linalg.norm(d, axis=-1)
        d = d / (dist[:, None] + 1e-9)
        front = (n * d).sum(-1) > 0.1
        vis |= front & ~march_blocked(p, d, max_dist=dist)
    return vis


def surface_samples(n_per_sphere, seed, eyes=None):
    """Surface points per sphere, restricted to where that sphere IS the
    union surface (not swallowed by a neighbour) and, when `eyes` is given,
    to points visible from at least one training camera."""
    rng = np.random.default_rng(seed)
    pts, comp = [], []
    for i in range(len(CENTERS)):
        d = rng.normal(size=(8 * n_per_sphere, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        p = (CENTERS[i] + RADII[i] * d).astype(np.float32)
        s, c = sdf_np(p)
        keep = (c == i) & (s > -1e-4)
        if eyes is not None:
            nrm = (p - CENTERS[i]) / RADII[i]
            keep &= _visible_from_any(p, nrm, eyes)
        p = p[keep][:n_per_sphere]
        pts.append(p)
        comp.append(np.full(len(p), i))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(comp).astype(np.int32))


def main():
    t_gt = time.time()
    views = make_views_sg(N_VIEWS, H, W)
    print(f"[recovery] GT views: {time.time()-t_gt:.0f}s", flush=True)
    train_views, test_view = views[:-1], views[-1]
    model = build_model(
        "bf16" if VARIANT in ("oracle", "oracle_init") else VARIANT)

    t0 = time.time()
    params = run_training(
        model, train_views, H, W, N_ITERS, SEED,
        eval_cb=lambda it, p, l: print(
            f"[recovery s{SEED} {VARIANT}] it={it} loss={l:.4f} "
            f"elapsed={(time.time()-t0)/60:.1f}m", flush=True),
        init_lgtSGs=(sg_lights_as_lgtSGs(SG_LIGHTS, 32)
                     if VARIANT in ("oracle", "oracle_init") else None),
        freeze_light=(VARIANT == "oracle"),
        # the shipped recipe's symmetry breaker (robot/run_s2.sh
        # --roughness_warmup 5000): fake fixed roughness for the first 5k
        # iterations so the specular path cannot absorb shading early
        roughness_warmup=5000,
    )

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

    results = {"iters": N_ITERS, "seed": SEED, "res": RES, "scene": "v2-sg",
               "train_views": N_VIEWS - 1, "variant": VARIANT}

    # ---- 1. held-out novel-view re-render --------------------------------
    rgb, hit = eval_render(params)
    rgb = np.asarray(rgb).reshape(H, W, 3)
    m = mask_t & np.asarray(hit).reshape(H, W)
    results["heldout_sg_psnr_db"] = round(masked_psnr(rgb, img_t, m), 3)

    # ---- 2. albedo recovery at surface points ----------------------------
    eyes = [C2W[:3, 3] for _, C2W, _, _ in train_views]
    pts, comp = surface_samples(2000, seed=SEED + 5, eyes=eyes)
    p_imp = params["implicit_network"]

    @jax.jit
    def query_albedo(pts):
        _, feat, g = model._sfg_closure(p_imp, True)(pts)
        normals = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-6)
        mat = model.envmap_material_network(
            params["envmap_material_network"], pts, feat, normals
        )
        return mat["sg_diffuse_albedo"]

    pred = np.array(query_albedo(jnp.asarray(pts)))
    gt = ALBEDOS[comp]
    # per-channel median scale alignment over ALL points (evaluate.py:24-31)
    for c in range(3):
        pred[:, c] *= np.median(gt[:, c] / np.clip(pred[:, c], 1e-4, None))
    results["albedo_psnr_db"] = round(
        -10 * np.log10(max(float(np.mean((pred - gt) ** 2)), 1e-10)), 3)
    # hue metric: one SCALAR scale per sphere (not per channel — chroma is
    # untouched) before the PSNR. The physical ambiguity is only the single
    # global light<->albedo scale, so per-region brightness spread is a real
    # decomposition error, but it is a DIFFERENT error from getting a
    # sphere's color wrong — report both, plus the scales themselves.
    hue_err, scales = [], []
    for i in range(len(CENTERS)):
        p_i, g_i = pred[comp == i], ALBEDOS[i]
        s = float(np.median(g_i.mean() / np.clip(p_i.mean(-1), 1e-4, None)))
        scales.append(round(1.0 / s, 3))  # recovered/gt brightness ratio
        hue_err.append((p_i * s - g_i) ** 2)
    results["albedo_hue_psnr_db"] = round(
        -10 * np.log10(max(float(np.mean(np.concatenate(hue_err))), 1e-10)), 3)
    results["albedo_per_sphere"] = {
        f"sphere{i}": {
            "gt": [round(float(x), 3) for x in ALBEDOS[i]],
            "recovered_aligned": [
                round(float(x), 3) for x in pred[comp == i].mean(0)],
            "brightness_ratio_vs_global": scales[i],
        }
        for i in range(len(CENTERS))
    }

    # ---- 2b. light recovery (separates light error from material error) --
    # render both the recovered and the GT light as lat-long radiance maps
    # and compare where the GT has energy: with a 2-lobe GT the sphere is
    # mostly dark, so a plain full-sphere PSNR would be dominated by the
    # empty regions. Report full-sphere AND energy-weighted numbers, plus
    # the recovered lgtSGs themselves (saved next to the JSON for post-hoc
    # analysis; reference envmaps/fit_envmap_with_sg.py visualizes the same
    # artifact).
    from nefii_tpu.ops.sg import compute_envmap

    lgt_rec = np.asarray(
        model.envmap_material_network.get_lgtSGs(
            params["envmap_material_network"]))
    He, We = 64, 128
    env_rec = np.asarray(compute_envmap(jnp.asarray(lgt_rec), He, We))
    env_gt = np.asarray(compute_envmap(
        jnp.asarray(sg_lights_as_lgtSGs(SG_LIGHTS, 32)), He, We))
    peak2 = float(env_gt.max()) ** 2  # peak-normalized: radiance spans ~[0,20]
    results["light_env_psnr_db"] = round(
        -10 * np.log10(max(float(np.mean((env_rec - env_gt) ** 2)) / peak2,
                           1e-10)), 3)
    w = env_gt.mean(-1) + 1e-3
    werr = ((env_rec - env_gt) ** 2).mean(-1)
    results["light_env_weighted_psnr_db"] = round(
        -10 * np.log10(max(float((werr * w).sum() / w.sum()) / peak2,
                           1e-10)), 3)
    np.save(OUT.replace(".json", "_lgtSGs.npy"), lgt_rec)

    # ---- 3. relighting ----------------------------------------------------
    R = rot_y(RELIGHT_DEG)
    lights_rot = rotate_sg_lights(SG_LIGHTS, R)
    gt_relit, _, _ = render_gt_sg(C2Wt, Kt, H, W, sg_lights=lights_rot,
                                  seed=1000 + N_VIEWS)
    # structural bound of the non-relightable indirect cache: hybrid GT =
    # relit direct + ORIGINAL-light indirect — what a PERFECT decomposition
    # with the reference's frozen radiance cache would produce
    gt_hybrid, _, aux_h = render_gt_sg(
        C2Wt, Kt, H, W, sg_lights=lights_rot, indirect_lights=SG_LIGHTS,
        seed=1000 + N_VIEWS)
    results["relight_structural_bound_db"] = round(
        masked_psnr(gt_hybrid, gt_relit, mask_t), 3)
    ind, dr = aux_h["indirect"][mask_t], aux_h["direct"][mask_t]
    results["indirect_fraction"] = round(
        float(ind.sum() / (ind.sum() + dr.sum())), 4)

    p_mat = dict(params["envmap_material_network"])
    lgt = model.envmap_material_network.get_lgtSGs(params["envmap_material_network"])
    p_mat["lgtSGs"] = jnp.asarray(rotate_lightsg(np.asarray(lgt), R))
    relit_params = dict(params, envmap_material_network=p_mat)
    rgb_r, hit_r = eval_render(relit_params)
    rgb_r = np.asarray(rgb_r).reshape(H, W, 3)
    m_r = mask_t & np.asarray(hit_r).reshape(H, W)
    results["relight_psnr_db"] = round(masked_psnr(rgb_r, gt_relit, m_r), 3)
    # control: the UNrotated render scored against the relit ground truth —
    # a failed decomposition (shading baked into albedo) matches this value;
    # a real one beats it
    results["relight_control_psnr_db"] = round(masked_psnr(rgb, gt_relit, m), 3)
    # GT-side anchor for the control: how far the relit GT is from the
    # original GT (what a zero-error baked model would score)
    results["relight_gt_vs_orig_db"] = round(
        masked_psnr(img_t, gt_relit, mask_t), 3)
    results["relight_deg"] = RELIGHT_DEG

    results["minutes"] = round((time.time() - t0) / 60, 1)
    json.dump(results, open(OUT, "w"), indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
