"""Long-horizon quality A/B (VERDICT r3 #6): exact reference secondary-ray
tracer vs the shipped reduced one (sphere_tracing_iters 10->5,
line_step_iters 3->0, n_steps 100->50, rootfind 32->16, sampler_budget 8192)
over 20k iterations, two seeds, on a synthetic multi-view NON-CONVEX scene
(blobby 3-sphere union -- secondary rays genuinely re-hit, so visibility +
indirect paths are active). Frozen Step-1-style geometry (the shipped
workflow), materials+light trained with pt_render_indirect_mlp + secondary
self-distillation every 10 iters. Reports held-out SG-render PSNR every 2000
iterations.

Usage: python ab.py <variant: exact|reduced> <seed> <iters> <out.json>
"""
import dataclasses as dc
import json
import sys
import time

import numpy as np

VARIANT, SEED, N_ITERS, OUT = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

import os

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                    # bench_fit
sys.path.insert(0, os.path.dirname(_HERE))   # nefii_tpu

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nefii_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import optax

from nefii_tpu.config import parse_string
from nefii_tpu.models.idr import IDRNetwork
from nefii_tpu.models.loss import IDRLoss
from nefii_tpu.parallel import spmd
from nefii_tpu.parallel.mesh import make_mesh

# ---------------- analytic scene ----------------
CENTERS = np.asarray([[0.25, 0.0, 0.0], [-0.2, 0.15, 0.1], [0.0, -0.25, -0.15]], np.float32)
RADII = np.asarray([0.45, 0.35, 0.3], np.float32)
LIGHT_DIR = np.asarray([0.4, 0.7, -0.6]) / np.linalg.norm([0.4, 0.7, -0.6])
ALBEDOS = np.asarray([[0.8, 0.35, 0.25], [0.3, 0.7, 0.35], [0.3, 0.4, 0.85]], np.float32)


def sdf_np(p):
    d = np.linalg.norm(p[..., None, :] - CENTERS, axis=-1) - RADII
    return d.min(-1), d.argmin(-1)


def render_gt(C2W, K, H, W):
    """Coarse CPU ray march with hard shadows: enough structure for the A/B."""
    v, u = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    d_cam = np.stack([(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)], -1)
    d_w = d_cam @ C2W[:3, :3].T
    d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
    o = C2W[:3, 3]
    img = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), bool)
    t = np.full((H, W), 0.5, np.float32)
    alive = np.ones((H, W), bool)
    for _ in range(128):
        p = o + t[..., None] * d_w
        s, _ = sdf_np(p)
        hit = alive & (s < 1e-3)
        alive &= ~hit & (t < 4.0)
        t = np.where(alive, t + np.maximum(s, 1e-3), t)
        mask |= hit
    p = o + t[..., None] * d_w
    s, comp = sdf_np(p)
    eps = 1e-3
    n = np.stack([
        sdf_np(p + [eps, 0, 0])[0] - sdf_np(p - [eps, 0, 0])[0],
        sdf_np(p + [0, eps, 0])[0] - sdf_np(p - [0, eps, 0])[0],
        sdf_np(p + [0, 0, eps])[0] - sdf_np(p - [0, 0, eps])[0]], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9
    # hard shadow: march toward the light
    sp = p + n * 2e-2
    st = np.full((H, W), 2e-2, np.float32)
    lit = np.ones((H, W), bool)
    for _ in range(64):
        q = sp + st[..., None] * LIGHT_DIR
        sq, _ = sdf_np(q)
        lit &= ~(sq < 5e-4)
        st += np.maximum(sq, 2e-3)
    shade = np.clip((n @ LIGHT_DIR), 0, 1) * lit + 0.15
    img = ALBEDOS[comp] * np.clip(shade, 0, 1.1)[..., None]
    img = np.where(mask[..., None], img, 1.0)
    return img.astype(np.float32), mask


def make_views(n, H, W, radius=2.0):
    views = []
    f = W * 1.1
    K = np.eye(4, dtype=np.float32); K[0, 0] = K[1, 1] = f; K[0, 2] = W / 2; K[1, 2] = H / 2
    for i in range(n):
        ang = 2 * np.pi * i / n
        el = 0.35 * np.sin(1.7 * i)
        eye = radius * np.array([np.sin(ang) * np.cos(el), np.sin(el), -np.cos(ang) * np.cos(el)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd); right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        C2W = np.eye(4, dtype=np.float32)
        C2W[:3, 0], C2W[:3, 1], C2W[:3, 2], C2W[:3, 3] = right, up, fwd, eye
        img, mask = render_gt(C2W, K, H, W)
        views.append((K, C2W, img, mask))
    return views


def main():
    H = W = 48
    n_views = 7  # 6 train + 1 held-out
    views = make_views(n_views, H, W)
    train_views, test_view = views[:-1], views[-1]

    conf = parse_string("""
    model{
        render_type = pt_render_indirect_mlp
        feature_vector_size = 256
        render_background = True
        implicit_network
        { d_in = 3
          d_out = 1
          dims = [256, 256, 256, 256]
          geometric_init = True
          bias = 0.6
          skip_in = [2]
          weight_norm = True
          multires = 6
          use_last_as_f = True }
        envmap_material_network
        { multires = 10
          dims = [256, 256, 256, 256]
          white_specular = True
          num_lgt_sgs = 32
          num_base_materials = 1
          fix_specular_albedo = True
          specular_albedo = [0.5, 0.5, 0.5]
          roughness_mlp = True
          specular_mlp = True
          same_mlp = True }
        rendering_network
        { mode = idr
          d_in = 9
          d_out = 3
          dims = [256, 256]
          weight_norm = True
          multires_view = 4
          multires_xyz = 10
          normalize_output = False
          clip_output = True
          clip_method = pow2
          weight_init = True }
        ray_tracer
        { object_bounding_sphere = 1.0
          sdf_threshold = 5.0e-5
          line_search_step = 0.5
          line_step_iters = 3
          sphere_tracing_iters = 10
          n_steps = 100
          n_rootfind_steps = 32 }
    }
    """).get_config("model")
    model = IDRNetwork.from_conf(conf)
    if VARIANT == "reduced":
        sec = dc.replace(
            model.ray_tracer, sphere_tracing_iters=5, line_step_iters=0,
            n_steps=50, n_rootfind_steps=16,
        )
        model = dc.replace(model, secondary_ray_tracer=sec)
    params = model.init_params(jax.random.PRNGKey(SEED))

    # Step-1-style frozen geometry: fit implicit net to the analytic blobby
    import bench_fit
    params = bench_fit.fit(model, params, CENTERS, RADII)

    loss = IDRLoss(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.1,
        mask_weight=100.0, alpha=50.0, loss_type="L1", env_loss_type="L2",
        background_rgb_weight=1.0,
    )
    mesh = make_mesh(1)

    S, R = 512, 8
    grad_sample = {
        "uv": np.zeros((1, S, R, 2), np.float32),
        "object_mask": np.ones((1, S), bool),
        "intrinsics": np.zeros((1, 4, 4), np.float32),
        "pose": np.zeros((1, 4, 4), np.float32),
    }
    gt_sample = {"rgb": np.zeros((1, S, 3), np.float32)}
    grad_fn = spmd.make_grad_fn(model, loss, mesh, freeze_geo=True)(grad_sample, gt_sample)

    def label_tree(params, train_keys):
        return {k: jax.tree_util.tree_map(
            lambda _: "train" if k in train_keys else "zero", v)
            for k, v in params.items()}

    idr_tx = optax.multi_transform(
        {"train": optax.adam(5e-4), "zero": optax.set_to_zero()},
        param_labels=label_tree(params, ("rendering_network",)),
    )
    sg_tx = optax.multi_transform(
        {"train": optax.adam(5e-4), "zero": optax.set_to_zero()},
        param_labels=label_tree(params, ("envmap_material_network",)),
    )
    idr_state, sg_state = idr_tx.init(params), sg_tx.init(params)

    @jax.jit
    def step(params, idr_state, sg_state, batch, gt, key):
        ld, grads, secondary = grad_fn(params, batch, gt, key, jnp.float32(50.0))
        u, idr_state = idr_tx.update(grads, idr_state, params)
        params = optax.apply_updates(params, u)
        u, sg_state = sg_tx.update(grads, sg_state, params)
        params = optax.apply_updates(params, u)
        return params, idr_state, sg_state, ld["loss"], secondary

    # secondary distillation step
    point_grad = spmd.make_point_grad_fn(model, mesh, freeze_geo=True)()
    KSEC, RSEC = 256, 8

    @jax.jit
    def sec_step(params, idr_state, sg_state, batch, valid, key):
        l, grads = point_grad(params, batch, valid, key)
        u, idr_state = idr_tx.update(grads, idr_state, params)
        params = optax.apply_updates(params, u)
        u, sg_state = sg_tx.update(grads, sg_state, params)
        params = optax.apply_updates(params, u)
        return params, idr_state, sg_state, l

    # eval: full held-out view, sg render PSNR inside mask
    Kt, C2Wt, img_t, mask_t = test_view
    W2Ct = np.linalg.inv(C2Wt)

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

    rng = np.random.default_rng(SEED * 131 + 7)
    key = jax.random.PRNGKey(SEED + 100)
    traj = []
    t_start = time.time()
    for it in range(N_ITERS + 1):
        vi = int(rng.integers(len(train_views)))
        Kv, C2Wv, img_v, mask_v = train_views[vi]
        pix = rng.choice(H * W, S, replace=False)
        base = np.stack([(pix % W) + 0.5, (pix // W) + 0.5], -1).astype(np.float32)
        jit = rng.uniform(-0.5, 0.5, (S, R, 2)).astype(np.float32)
        batch = {
            "uv": jnp.asarray((base[:, None, :] + jit)[None]),
            "object_mask": jnp.asarray(mask_v.reshape(-1)[pix][None]),
            "intrinsics": jnp.asarray(Kv[None]),
            "pose": jnp.asarray(C2Wv[None]),
        }
        gt = {"rgb": jnp.asarray(img_v.reshape(-1, 3)[pix][None])}
        key, sub = jax.random.split(key)
        params, idr_state, sg_state, l, secondary = step(
            params, idr_state, sg_state, batch, gt, sub
        )
        if it % 10 == 0 and secondary:
            pts = np.asarray(secondary["secondary_points"]).reshape(-1, 3)
            msk = np.asarray(secondary["secondary_mask"]).reshape(-1)
            dirs = np.asarray(secondary["secondary_dir"]).reshape(-1, 3)
            if msk.sum() >= 1:
                order = np.argsort(~msk, kind="stable")[:KSEC]
                valid = msk[order]
                sp = np.broadcast_to(pts[order][:, None], (KSEC, RSEC, 3))
                sd = np.broadcast_to(dirs[order][:, None], (KSEC, RSEC, 3))
                key, sub = jax.random.split(key)
                params, idr_state, sg_state, _ = sec_step(
                    params, idr_state, sg_state,
                    {"points": jnp.asarray(sp), "ray_dirs": jnp.asarray(sd)},
                    jnp.asarray(valid, jnp.float32), sub,
                )
        if it % 2000 == 0:
            p = psnr_now(params)
            traj.append([it, round(p, 3)])
            el = time.time() - t_start
            print(f"[{VARIANT} s{SEED}] it={it} loss={float(l):.4f} "
                  f"heldout_sg_psnr={p:.2f} dB elapsed={el/60:.1f}m", flush=True)
            json.dump({"variant": VARIANT, "seed": SEED, "traj": traj},
                      open(OUT, "w"))
    json.dump({"variant": VARIANT, "seed": SEED, "traj": traj, "done": True},
              open(OUT, "w"))


if __name__ == "__main__":
    main()
