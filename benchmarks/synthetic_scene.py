"""Shared synthetic multi-view scene for the quality benchmarks.

An analytic blobby 3-sphere union (NON-CONVEX, so secondary rays genuinely
re-hit and the visibility/indirect paths are active) with known per-sphere
diffuse albedos and a known directional light + ambient floor. Ground-truth
images come from a coarse CPU ray march with hard shadows. Used by
ab_secondary_tracer.py (exact-vs-reduced secondary tracer A/B) and
decomposition_recovery.py (albedo + relighting recovery vs the analytic
ground truth).
"""
import numpy as np

CENTERS = np.asarray([[0.25, 0.0, 0.0], [-0.2, 0.15, 0.1], [0.0, -0.25, -0.15]], np.float32)
RADII = np.asarray([0.45, 0.35, 0.3], np.float32)
LIGHT_DIR = np.asarray([0.4, 0.7, -0.6]) / np.linalg.norm([0.4, 0.7, -0.6])
ALBEDOS = np.asarray([[0.8, 0.35, 0.25], [0.3, 0.7, 0.35], [0.3, 0.4, 0.85]], np.float32)
AMBIENT = 0.15


def sdf_np(p):
    d = np.linalg.norm(p[..., None, :] - CENTERS, axis=-1) - RADII
    return d.min(-1), d.argmin(-1)


def march_blocked(origin, dirs, max_dist=None, n_steps=64):
    """Sphere-march from `origin` along `dirs`; True where the march
    re-enters the surface (before `max_dist` when given). One home for the
    march constants, shared by the GT shadow rays and the benchmark's
    camera-visibility filter."""
    t = np.full(origin.shape[:-1], 2e-2, np.float32)
    blocked = np.zeros(origin.shape[:-1], bool)
    for _ in range(n_steps):
        s, _ = sdf_np(origin + t[..., None] * dirs)
        hit = s < 5e-4
        if max_dist is not None:
            hit = hit & (t < max_dist - 1e-2)
        blocked |= hit
        t += np.maximum(s, 2e-3)
    return blocked


LIGHT2_DIR = np.asarray([-0.5, 0.35, 0.75]) / np.linalg.norm([-0.5, 0.35, 0.75])
LIGHT2_RGB = np.asarray([0.25, 0.30, 0.45], np.float32)  # dim cool fill


def render_gt(C2W, K, H, W, light_dir=LIGHT_DIR, lights=None):
    """Coarse CPU ray march with hard shadows: enough structure for the A/B.

    `light_dir` is overridable so relighting benchmarks can produce ground
    truth under a rotated light from the same analytic scene.

    `lights` — list of (direction, rgb) pairs, every one SHADOW-TRACED.
    Default None keeps the legacy scene (one white light along `light_dir`
    plus the unshadowed AMBIENT floor — the recorded A/B's scene). The
    decomposition benchmark passes explicit lights instead: an unshadowed
    ambient term is not representable by the SG-light + traced-visibility
    model family, so with the legacy scene the optimizer is FORCED to bake
    the model/scene mismatch into albedo; all-shadowed lights make the GT
    physically consistent with what the method can recover."""
    v, u = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    d_cam = np.stack([(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)], -1)
    d_w = d_cam @ C2W[:3, :3].T
    d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
    o = C2W[:3, 3]
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
    def shadow_lit(ldir):
        # hard shadow: march toward the light from a normal-offset start
        return ~march_blocked(p + n * 2e-2, ldir)

    if lights is None:  # legacy single-light + ambient scene
        shade = np.clip((n @ light_dir), 0, 1) * shadow_lit(light_dir) + AMBIENT
        shade_rgb = np.clip(shade, 0, 1.1)[..., None]
    else:
        shade_rgb = np.zeros((H, W, 3), np.float32)
        for ldir, lrgb in lights:
            ldir = np.asarray(ldir, np.float32)
            shade_rgb = shade_rgb + np.asarray(lrgb, np.float32) * (
                np.clip(n @ ldir, 0, 1) * shadow_lit(ldir)
            )[..., None]
        shade_rgb = np.clip(shade_rgb, 0, 1.1)
    img = ALBEDOS[comp] * shade_rgb
    img = np.where(mask[..., None], img, 1.0)
    return img.astype(np.float32), mask


def make_views(n, H, W, radius=2.0, light_dir=LIGHT_DIR, lights=None):
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
        img, mask = render_gt(C2W, K, H, W, light_dir=light_dir, lights=lights)
        views.append((K, C2W, img, mask))
    return views


MODEL_CONF = """
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
"""


def build_model(variant="reduced"):
    """The benchmark model; variant selects the secondary tracer and the
    fused-SDF knobs:
      "exact"   — reference secondary-tracer iteration counts
      "reduced" — the shipped confs/conf.conf secondary_ray_tracer
      "fused"   — reduced + use_fused_sdf (Pallas kernel, fp32): the shipped
                  confs/conf.conf default; TPU-only, A/B control arm
      "bf16"    — fused with fused_sdf_dtype=bfloat16: the candidate arm of
                  the bf16-trace A/B (VERDICT r3 #4)"""
    import dataclasses as dc

    from nefii_tpu.config import parse_string
    from nefii_tpu.models.idr import IDRNetwork

    model = IDRNetwork.from_conf(parse_string(MODEL_CONF).get_config("model"))
    if variant != "exact":
        sec = dc.replace(
            model.ray_tracer, sphere_tracing_iters=5, line_step_iters=0,
            n_steps=50, n_rootfind_steps=16,
        )
        model = dc.replace(model, secondary_ray_tracer=sec)
    if variant in ("fused", "bf16"):
        model = dc.replace(
            model, use_fused_sdf=True,
            fused_sdf_dtype="bfloat16" if variant == "bf16" else "float32",
        )
    return model


def run_training(model, train_views, H, W, n_iters, seed,
                 eval_cb=None, eval_every=2000, S=512, R=8):
    """The benchmark training loop (shared by the A/B and the decomposition
    recovery): Step-1-style frozen geometry fit to the analytic blobby, then
    materials+light trained with pt_render_indirect_mlp + secondary
    self-distillation every 10 iters, the shipped Step-2 recipe at small
    scale. `eval_cb(it, params, loss)` fires every `eval_every` iterations.
    Returns the final params."""
    import bench_fit
    import jax
    import jax.numpy as jnp
    import optax

    from nefii_tpu.models.loss import IDRLoss
    from nefii_tpu.parallel import spmd
    from nefii_tpu.parallel.mesh import make_mesh

    params = model.init_params(jax.random.PRNGKey(seed))
    params = bench_fit.fit(model, params, CENTERS, RADII)

    loss = IDRLoss(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.1,
        mask_weight=100.0, alpha=50.0, loss_type="L1", env_loss_type="L2",
        background_rgb_weight=1.0,
    )
    mesh = make_mesh(1)

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

    rng = np.random.default_rng(seed * 131 + 7)
    key = jax.random.PRNGKey(seed + 100)
    for it in range(n_iters + 1):
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
        if eval_cb is not None and it % eval_every == 0:
            eval_cb(it, params, float(l))
    return params
