"""Monte-Carlo path-traced shading with near-field indirect illumination.

TPU-native re-design of the reference's model/path_tracing_render.py family
(12 `pt_render*` variants, :416-2166). One engine, `pt_render_core`, covers
the whole family through static options; the reference entry points are thin
wrappers with matching names/semantics (see the dispatch table in
implicit_differentiable_renderer.py:721-759).

Key design decisions (SURVEY.md §7):
  * The model<->shader cycle becomes explicit closures in `SceneFns` — the
    shader never holds a module reference, so the whole render jits.
  * All strategies' secondary rays are concatenated into ONE ray-tracer call
    (the reference's `speed_first` batching, :1332-1375); `speed_first=False`
    runs strategies through `lax.map` for 3x lower peak memory (the
    `_memsave` variants, :1260-1262).
  * Visibility/indirect MLP evaluations run dense over all rays and are
    masked afterwards — fixed shapes, no boolean gathers.
  * Sampling and the 3x3 pdf matrix sit under `stop_gradient`, mirroring the
    reference's `torch.no_grad()` blocks; light SGs, materials, soft
    visibility, and indirect radiance stay differentiable exactly as in the
    reference (grad-boundary parity is required for training to converge —
    SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.sample_network import sample_network
from nefii_tpu.ops import sampling
from nefii_tpu.ops.sampling import TINY_NUMBER
from nefii_tpu.ops.sg import safe_norm
from nefii_tpu.utils.camera import get_sphere_intersection

stop_grad = jax.lax.stop_gradient


class SceneFns(NamedTuple):
    """Closures over network params that the shader calls back into.

    trace(origins [N,3], dirs [N,3], key, training) -> (points, hit_mask, dists)
        — secondary-ray sphere tracer; outputs are already stop-gradiented.
    implicit(pts [P,3]) -> [P, 1+F]  (sdf + geometry feature)
    implicit_grad(pts [P,3]) -> [P,3]  (differentiable spatial sdf gradient)
    radiance(pts, normals, view_dirs, feats) -> [P,3]  (IDR radiance cache)
    """

    trace: Callable
    implicit: Callable
    implicit_grad: Callable
    radiance: Callable
    feature_size: int = 0
    bounding_sphere: float = 1.0
    # optional fused pts -> (sdf [P], feature [P,F], grad [P,3]) — one
    # forward+backward instead of two forwards + a backward (hot path)
    implicit_with_grad: Optional[Callable] = None


# ---------------------------------------------------------------------------
# shared shading pieces
# ---------------------------------------------------------------------------

def ggx_brdf_direct(
    wi: jnp.ndarray,
    normal: jnp.ndarray,
    viewdirs: jnp.ndarray,
    roughness: jnp.ndarray,
    specular_reflectance: jnp.ndarray,
) -> jnp.ndarray:
    """Cook-Torrance specular BRDF evaluated in direction space.

    Matches the reference's stable-root GGX D (path_tracing_render.py:1428-1434),
    Schlick-approx Fresnel and Smith G (:1436-1449). Shapes broadcast:
    roughness [...,1] or [K,1], specular [...,3] or [K,3].
    """
    half = wi + viewdirs
    # safe_norm: wi == -viewdirs (grazing/masked sample) must not NaN the grad
    half = half / (safe_norm(half) + TINY_NUMBER)

    n_dot_h = jnp.clip(jnp.sum(normal * half, -1, keepdims=True), 0.0)
    r2 = roughness**2
    root = n_dot_h**2 + (1 - n_dot_h**2) / (r2**2)
    D = 1.0 / (np.pi * (r2**2) * root * root)

    v_dot_h = jnp.clip(jnp.sum(viewdirs * half, -1, keepdims=True), 0.0)
    F = specular_reflectance + (1.0 - specular_reflectance) * jnp.power(
        2.0, -(5.55473 * v_dot_h + 6.8316) * v_dot_h
    )

    dot1 = jnp.clip(jnp.sum(viewdirs * normal, -1, keepdims=True), 0.0)
    dot2 = jnp.clip(jnp.sum(wi * normal, -1, keepdims=True), 0.0)
    k = (roughness + 1.0) ** 2 / 8.0
    G1 = dot1 / (dot1 * (1 - k) + k + TINY_NUMBER)
    G2 = dot2 / (dot2 * (1 - k) + k + TINY_NUMBER)
    return F * D * G1 * G2 / (4 * dot1 * dot2 + TINY_NUMBER)


def visibility_and_indirect(
    scene: SceneFns,
    light_points: jnp.ndarray,  # [P,3] secondary hit (or fallback) points, detached
    hit_mask: jnp.ndarray,      # [P,1]
    dists: jnp.ndarray,         # [P,1]
    wi: jnp.ndarray,            # [P,3]
    render_points: jnp.ndarray, # [P,3] primary surface points
    diff_geo: bool,
):
    """Soft/hard visibility + indirect radiance at secondary hits.

    Reference: get_visibility_and_indirect_light (path_tracing_render.py:
    2109-2166). Dense evaluation, masked at the end.
    """
    fused = (not diff_geo) and scene.implicit_with_grad is not None
    if fused:
        sdf_raw, feats_all, g = scene.implicit_with_grad(light_points)
        sdf_value = jax.nn.relu(sdf_raw[:, None])
        out = None
    else:
        out = scene.implicit(light_points)
        sdf_value = jax.nn.relu(out[:, 0:1])

    if diff_geo:
        alpha = 50.0
        visibility = 1 - jnp.log(1 + jnp.exp(-alpha * sdf_value)) / np.log(2.0)
    else:
        visibility = 1 - hit_mask.astype(jnp.float32)

    if diff_geo:
        grad = scene.implicit_grad(light_points)
        dsp = sample_network(
            sdf_value,
            stop_grad(sdf_value),
            stop_grad(grad),
            dists,
            render_points,
            wi,
        )
    else:
        dsp = light_points

    if not fused:
        g = scene.implicit_grad(dsp)
    if not diff_geo:
        g = stop_grad(g)
    normals = g / (safe_norm(g) + 1e-6)
    view_dirs = -wi
    view_dirs = view_dirs / (safe_norm(view_dirs) + 1e-6)

    if scene.feature_size > 0:
        feats = feats_all if fused else out[:, 1:]
    else:
        feats = None
    idr_rgb = scene.radiance(dsp, normals, view_dirs, feats)
    idr_rgb = jnp.where(hit_mask, idr_rgb, 0.0)
    return visibility, idr_rgb


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

_SAMPLERS = ("cos", "brdf", "mix_sg", "env2d")


def pt_render_core(
    key: jax.Array,
    lgtSGs: jnp.ndarray,                 # [M,7] SG light or [H,W,3] constant map
    specular_reflectance: jnp.ndarray,   # [K,3] or [...,3]
    roughness: jnp.ndarray,              # [K,1] or [...,1]
    diffuse_albedo: jnp.ndarray,         # [...,3]
    normal: jnp.ndarray,                 # [N,3] unit, toward camera side
    viewdirs: jnp.ndarray,               # [N,3] unit, surface -> camera
    points: Optional[jnp.ndarray] = None,  # [N,3] surface points (for shadows)
    scene: Optional[SceneFns] = None,
    *,
    strategies: Tuple[str, ...] = ("cos", "brdf", "mix_sg"),
    shadow: Optional[str] = None,        # None | "hard" | "soft" | "indirect"
    diff_geo: bool = False,
    sphere_fallback: bool = False,       # replace miss hit-points by far-sphere points
    light_type: str = "sg",
    blending_weights: Optional[jnp.ndarray] = None,
    blend_materials: bool = False,
    diffuse_rgb: Optional[jnp.ndarray] = None,
    speed_first: bool = True,
    training: bool = False,
    remat_strategies: bool = False,  # jax.checkpoint each strategy's block
    wi_override: Optional[Tuple[jnp.ndarray, ...]] = None,
    indirect_fraction: float = 1.0,
    secondary_fraction: float = 1.0,
    measure_demand: bool = False,  # emit n_*_demand counters (probe mode)
) -> Dict[str, jnp.ndarray]:
    N = normal.shape[0]
    S = len(strategies)

    # Horizon-culled secondary trace (eval only): every strategy's
    # contribution is multiplied by clip(wi.n, 0) (strategy_contrib below),
    # so a secondary ray with wi.n <= 0 contributes EXACTLY zero no matter
    # what its trace returns — tracing it is pure waste. With a budget of
    # secondary_fraction * S*N rays, the above-horizon rays are gathered
    # first (stable argsort on the sign mask), only those trace, and results
    # scatter back with miss defaults for the culled remainder. Exact while
    # the budget covers the above-horizon count; above-horizon rays beyond
    # it degrade to unoccluded-no-indirect and are counted in
    # n_cull_overflow (exact iff 0). Training stays dense: the secondary
    # self-distillation buffers supervise the vis/indirect MLPs on ALL
    # traced hits, including below-horizon directions the estimator ignores.
    horizon_budget = None
    if (secondary_fraction < 1.0 and not training and speed_first
            and shadow is not None):
        horizon_budget = min(max(int(S * N * secondary_fraction + 0.5), 128),
                             S * N)
        if horizon_budget >= S * N:
            horizon_budget = None

    # Hit-compacted vis/indirect (non-diff_geo "indirect" only): the
    # indirect-radiance MLP chain (fused SDF fwd+input-grad + radiance net)
    # is evaluated densely at every secondary ray but its output is masked
    # to HITS (visibility_and_indirect's `where(hit_mask, idr_rgb, 0)`), and
    # hard visibility is 1-hit_mask, no SDF needed — so gathering the hit
    # rays into a static budget before the MLPs and scattering zeros back is
    # EXACT whenever the budget covers the hit count (overflow hits beyond
    # it degrade to 0-indirect, counted in n_indirect_overflow, same
    # accounting as every other compaction budget). diff_geo soft visibility
    # needs the SDF at every ray, so that path stays dense.
    indirect_budget = None
    if indirect_fraction < 1.0 and shadow == "indirect" and not diff_geo:
        indirect_budget = min(max(int(N * indirect_fraction + 0.5), 128), N)
        if indirect_budget >= N:
            indirect_budget = None

    if blend_materials and blending_weights is not None:
        # K base materials blended per-point before sampling (:1757-1764)
        specular_reflectance = (
            specular_reflectance[None, :, :] * blending_weights[..., None]
        ).sum(-2)
        roughness = (roughness[None, :, :] * blending_weights[..., None]).sum(-2)

    # per-ray roughness for BRDF sampling: [K=1,1] globals broadcast to [N,1]
    if roughness.ndim == 2 and roughness.shape[0] == 1 and N != 1:
        roughness_brdf = jnp.broadcast_to(roughness, (N, 1))
    else:
        roughness_brdf = roughness

    lgt_for_pdf = lgtSGs

    # ---- sampling (no grad, reference :1290-1325) ------------------------
    normal_s = stop_grad(normal)
    viewdirs_s = stop_grad(viewdirs)
    rough_s = stop_grad(roughness_brdf)
    lgt_s = stop_grad(lgtSGs)

    def pdf_fn_for(name):
        if name == "cos":
            return sampling.pdf_fn_cos
        if name == "brdf":
            return sampling.pdf_fn_brdf_ggx
        if name == "mix_sg":
            return sampling.pdf_fn_mix_sg_shared
        if name == "env2d":
            return sampling.pdf_fn_constant_2d_light
        raise ValueError(name)

    keys = jax.random.split(key, S + 1)
    wi_list: List[jnp.ndarray] = []
    pdf_list: List[jnp.ndarray] = []
    for i, name in enumerate(strategies):
        if wi_override is not None:
            # test hook: inject fixed per-strategy sample directions so the
            # full estimator (pdf matrix -> batched trace -> visibility/
            # indirect -> MIS combine) can be compared head-to-head against
            # the torch reference on identical samples. The pdf comes from
            # the strategy's canonical pdf function — exactly what the
            # sampler would have returned for these directions.
            wi = jnp.asarray(wi_override[i])
            pdf = pdf_fn_for(name)(wi, normal_s, viewdirs_s, rough_s, lgt_s)
        elif name == "cos":
            wi, pdf = sampling.cos_sampling(keys[i], normal_s)
        elif name == "brdf":
            wi, pdf = sampling.brdf_sampling(keys[i], normal_s, rough_s, viewdirs_s)
        elif name == "mix_sg":
            wi, pdf = sampling.mix_sg_sampling_shared(keys[i], normal_s, lgt_s)
        elif name == "env2d":
            wi, pdf = sampling.constant_2d_light_sampling(keys[i], normal_s, lgt_s)
        else:
            raise ValueError(name)
        wi_list.append(stop_grad(wi))
        pdf_list.append(jnp.clip(stop_grad(pdf), TINY_NUMBER))

    # 3x3 pdf matrix for MIS (reference :1312-1325)
    pdf_matrix: List[List[jnp.ndarray]] = []
    for i in range(S):
        row = []
        for j, name_j in enumerate(strategies):
            if j == i:
                row.append(pdf_list[i])
            else:
                row.append(
                    stop_grad(
                        pdf_fn_for(name_j)(wi_list[i], normal_s, viewdirs_s, rough_s, lgt_s)
                    )
                )
        pdf_matrix.append(row)

    # ---- secondary-ray visibility (no grad through the tracer) -----------
    hit_list: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = []
    if shadow is not None:
        assert points is not None and scene is not None
        pts_flat = stop_grad(points)
        trace_training = training and diff_geo  # min-SDF fallback only matters for soft vis

        def trace_one(args):
            wi, k = args
            res = scene.trace(pts_flat, wi, k, trace_training)
            lp, hm, ds = res[0], res[1], res[2]
            ne = res[3] if len(res) > 3 else jnp.int32(0)
            ov = res[4] if len(res) > 4 else jnp.int32(0)
            return stop_grad(lp), hm, stop_grad(ds), ne, ov

        trace_keys = jax.random.split(keys[S], S)
        n_cull_overflow = jnp.int32(0)
        demands = {}
        if speed_first:
            all_pts = jnp.tile(pts_flat, (S, 1))
            all_dirs = jnp.concatenate(wi_list, axis=0)
            if measure_demand:
                # above-horizon count: the exact demand of the horizon cull
                # (clip(wi.n,0) zeroes every below-horizon contribution)
                all_n_m = jnp.tile(stop_grad(normal), (S, 1))
                demands["n_cull_demand"] = (
                    (jnp.sum(all_dirs * all_n_m, -1) > 0.0)
                    .sum().astype(jnp.int32))
            if horizon_budget is not None:
                # gather above-horizon rays first, trace only the budget,
                # scatter back with miss defaults (hm=False, lp=origin) for
                # the culled remainder — see horizon_budget above
                all_n = jnp.tile(stop_grad(normal), (S, 1))
                above = jnp.sum(all_dirs * all_n, -1) > 0.0
                order = jnp.argsort(~above, stable=True)
                sel = order[:horizon_budget]
                res = scene.trace(all_pts[sel], all_dirs[sel], trace_keys[0],
                                  trace_training)
                lp_c, hm_c, ds_c = res[0], res[1], res[2]
                n_trace_evals = res[3] if len(res) > 3 else jnp.int32(0)
                n_trace_overflow = res[4] if len(res) > 4 else jnp.int32(0)
                if measure_demand and len(res) > 5:
                    demands.update(zip(
                        ("n_sec_sampler_demand", "n_sec_minsdf_demand",
                         "n_sec_rootfind_demand", "n_sec_trace_demand"),
                        res[5:9]))
                lp = all_pts.at[sel].set(stop_grad(lp_c))
                hm = jnp.zeros((S * N,), bool).at[sel].set(hm_c)
                ds = jnp.zeros((S * N,), ds_c.dtype).at[sel].set(
                    stop_grad(ds_c))
                n_cull_overflow = jnp.maximum(
                    above.sum().astype(jnp.int32) - horizon_budget, 0)
            else:
                res = scene.trace(all_pts, all_dirs, trace_keys[0],
                                  trace_training)
                lp, hm, ds = res[0], res[1], res[2]
                n_trace_evals = res[3] if len(res) > 3 else jnp.int32(0)
                n_trace_overflow = res[4] if len(res) > 4 else jnp.int32(0)
                if measure_demand and len(res) > 5:
                    # granular demands of the ONE batched secondary trace
                    # (scene_fns.trace appends them in measure mode)
                    demands.update(zip(
                        ("n_sec_sampler_demand", "n_sec_minsdf_demand",
                         "n_sec_rootfind_demand", "n_sec_trace_demand"),
                        res[5:9]))
                lp, ds = stop_grad(lp), stop_grad(ds)
            for i in range(S):
                hit_list.append(
                    (lp[i * N : (i + 1) * N], hm[i * N : (i + 1) * N, None], ds[i * N : (i + 1) * N, None])
                )
        else:
            stacked = jax.lax.map(
                trace_one, (jnp.stack(wi_list), trace_keys)
            )
            n_trace_evals = stacked[3].sum()
            n_trace_overflow = stacked[4].sum()
            for i in range(S):
                hit_list.append((stacked[0][i], stacked[1][i][:, None], stacked[2][i][:, None]))

        if sphere_fallback:
            # miss rays: push the "hit" point to the far bounding sphere
            # (reference :962-969) so soft visibility saturates to 1 there
            new_hits = []
            for i in range(S):
                lp, hm, ds = hit_list[i]
                si, _ = get_sphere_intersection(
                    pts_flat, wi_list[i][:, None, :], r=scene.bounding_sphere
                )
                far = si.max(axis=2)[:, 0]  # [N]
                sphere_pts = pts_flat + far[:, None] * wi_list[i]
                lp = jnp.where(hm, lp, sphere_pts)
                new_hits.append((lp, hm, ds))
            hit_list = new_hits

    # ---- per-strategy visibility/indirect + shading -----------------------
    # One function per strategy so `remat_strategies` can jax.checkpoint it:
    # the secondary MLP activations (visibility features + indirect radiance
    # over S*N points) dominate training memory; rematerialising each
    # strategy's block caps the peak at ONE strategy's activations.
    def strategy_contrib(i, lgtSGs, specular_reflectance, roughness,
                         diffuse_albedo, normal, viewdirs, wi, pdf, pdf_row,
                         lp, hm, ds):
        if shadow is None:
            visible, indirect = None, None
        elif shadow == "hard":
            visible, indirect = 1.0 - hm.astype(jnp.float32), None
        elif shadow == "soft":
            # differentiable soft visibility, no indirect (reference :973-986)
            sdf_value = jax.nn.relu(scene.implicit(lp)[:, 0:1])
            visible = 1 - jnp.log(1 + jnp.exp(-50.0 * sdf_value)) / np.log(2.0)
            indirect = None
        elif shadow == "indirect":
            if indirect_budget is not None:
                # gather hit rays first into the static budget, run the MLP
                # chain there only, scatter zeros back (exact while the
                # budget covers the hits — see indirect_budget above)
                hmf = hm[:, 0]
                order = jnp.argsort(~hmf, stable=True)
                sel = order[:indirect_budget]
                _, ind_c = visibility_and_indirect(
                    scene, lp[sel], hm[sel], ds[sel], wi[sel],
                    stop_grad(points)[sel], diff_geo,
                )
                visible = 1.0 - hm.astype(jnp.float32)
                indirect = jnp.zeros((N, 3), ind_c.dtype).at[sel].set(ind_c)
            else:
                visible, indirect = visibility_and_indirect(
                    scene, lp, hm, ds, wi, stop_grad(points), diff_geo
                )
        else:
            raise ValueError(shadow)

        if light_type == "sg":
            light = sampling.sg_light_eval(wi, lgtSGs)  # grads flow to lgtSGs
        else:
            light = sampling.envmap_lookup(wi, lgtSGs)

        if visible is not None:
            if indirect is not None:
                light = light * visible + (1 - visible) * indirect
            else:
                light = light * visible

        if roughness.ndim == 2 and roughness.shape[0] not in (N, 1) and not blend_materials:
            # K>1 global materials without blending: sum over K (reference :628-682)
            fs = ggx_brdf_direct(
                wi[:, None, :], normal[:, None, :], viewdirs[:, None, :],
                roughness[None, :, :], specular_reflectance[None, :, :],
            ).sum(-2)
        else:
            fs = ggx_brdf_direct(wi, normal, viewdirs, roughness, specular_reflectance)

        weight = sampling.power_heuristic_list([1] * S, pdf_row, i)
        w_i_dot_n = jnp.clip(jnp.sum(wi * normal, -1, keepdims=True), 0.0)

        spec = jnp.clip(weight * light * fs * w_i_dot_n / pdf, 0.0)
        diff = jnp.clip(
            weight * light * (diffuse_albedo / np.pi) * w_i_dot_n / pdf, 0.0
        )
        return spec, diff

    contrib = strategy_contrib
    if remat_strategies:
        contrib = jax.checkpoint(strategy_contrib, static_argnums=(0,))

    specular_final = 0.0
    diffuse_final = 0.0
    for i in range(S):
        lp, hm, ds = hit_list[i] if hit_list else (None, None, None)
        spec, diff = contrib(
            i, lgtSGs, specular_reflectance, roughness, diffuse_albedo,
            normal, viewdirs, wi_list[i], pdf_list[i], pdf_matrix[i],
            lp, hm, ds,
        )
        specular_final = specular_final + spec
        diffuse_final = diffuse_final + diff

    if diffuse_rgb is not None:
        diffuse_final = diffuse_rgb

    ret = {
        "sg_rgb": specular_final + diffuse_final,
        "sg_specular_rgb": specular_final,
        "sg_diffuse_rgb": diffuse_final,
        "sg_diffuse_albedo": diffuse_albedo,
    }
    if shadow is not None:
        ret["secondary_points"] = jnp.stack([h[0] for h in hit_list], 0)   # [S,N,3]
        ret["secondary_mask"] = jnp.stack([h[1] for h in hit_list], 0)     # [S,N,1]
        ret["secondary_dir"] = jnp.stack(wi_list, 0)                       # [S,N,3]
        # secondary SDF point-samples: trace + one visibility eval per ray
        # (per budgeted ray when the vis/indirect compaction is on)
        per_strategy = indirect_budget if indirect_budget is not None else N
        vis_evals = S * per_strategy if shadow in ("soft", "indirect") else 0
        ret["n_sdf_evals"] = n_trace_evals + jnp.int32(vis_evals)
        # secondary rays the tracer's budgeted fallbacks dropped (exact iff 0)
        ret["n_overflow"] = n_trace_overflow
        # above-horizon rays the horizon-cull budget left untraced (exact
        # iff 0; below-horizon rays are never counted — they contribute 0)
        ret["n_cull_overflow"] = n_cull_overflow
        if indirect_budget is not None:
            # hit rays whose indirect radiance degraded to 0 (exact iff 0)
            ovf = jnp.int32(0)
            for _, hm_i, _ in hit_list:
                ovf = ovf + jnp.maximum(
                    hm_i.sum().astype(jnp.int32) - indirect_budget, 0
                )
            ret["n_indirect_overflow"] = ovf
        else:
            ret["n_indirect_overflow"] = jnp.int32(0)
        if measure_demand:
            # per-strategy hit-count max: the vis/indirect compaction budget
            # is per strategy, so its exact demand is the worst strategy's
            hits = jnp.stack(
                [hm_i.sum().astype(jnp.int32) for _, hm_i, _ in hit_list])
            ret["n_indirect_demand"] = hits.max()
            ret.update(demands)
    return ret


# ---------------------------------------------------------------------------
# reference-named variants (dispatch parity with
# implicit_differentiable_renderer.py:721-759)
# ---------------------------------------------------------------------------

def pt_render(key, lgtSGs, specular_reflectance, roughness, diffuse_albedo,
              normal, viewdirs, points=None, scene=None, blending_weights=None,
              diffuse_rgb=None, training=False):
    """cos+BRDF MIS, no shadows (reference :557-711)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, strategies=("cos", "brdf"), shadow=None,
        blending_weights=blending_weights, diffuse_rgb=diffuse_rgb,
        training=training,
    )


def pt_render_shadow(key, lgtSGs, specular_reflectance, roughness, diffuse_albedo,
                     normal, viewdirs, points, scene, blending_weights=None,
                     diffuse_rgb=None, training=False):
    """+ hard visibility by tracing secondary rays (reference :714-874)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="hard", blending_weights=blending_weights,
        diffuse_rgb=diffuse_rgb, training=training,
    )


def pt_render_diff_shadow(key, lgtSGs, specular_reflectance, roughness,
                          diffuse_albedo, normal, viewdirs, points, scene,
                          blending_weights=None, diffuse_rgb=None, training=False):
    """+ differentiable soft visibility (reference :877-1065)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="soft", diff_geo=True, sphere_fallback=True,
        blending_weights=blending_weights, diffuse_rgb=diffuse_rgb,
        training=training,
    )


def pt_render_diff_shadow_indirect(key, lgtSGs, specular_reflectance, roughness,
                                   diffuse_albedo, normal, viewdirs, points, scene,
                                   blending_weights=None, diffuse_rgb=None,
                                   training=False):
    """+ indirect light from the radiance cache (reference :1068-1252)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="indirect", diff_geo=True, sphere_fallback=True,
        blending_weights=blending_weights, diffuse_rgb=diffuse_rgb,
        training=training,
    )


def pt_render_diff_shadow_indirect_mlp(key, lgtSGs, specular_reflectance, roughness,
                                       diffuse_albedo, normal, viewdirs, points,
                                       scene, blending_weights=None,
                                       diffuse_rgb=None, diff_geo=True,
                                       speed_first=True, training=False):
    """MLP materials + 3-strategy MIS + indirect (reference :1265-1487)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="indirect", diff_geo=diff_geo, sphere_fallback=False,
        blending_weights=blending_weights, diffuse_rgb=diffuse_rgb,
        speed_first=speed_first, training=training,
    )


def pt_render_indirect_mlp(key, lgtSGs, specular_reflectance, roughness,
                           diffuse_albedo, normal, viewdirs, points, scene,
                           blending_weights=None, diffuse_rgb=None, training=False):
    """The default NeFII config path (reference :1255-1257): diff_geo=False."""
    return pt_render_diff_shadow_indirect_mlp(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, blending_weights, diffuse_rgb,
        diff_geo=False, speed_first=True, training=training,
    )


def pt_render_indirect_mlp_memsave(key, lgtSGs, specular_reflectance, roughness,
                                   diffuse_albedo, normal, viewdirs, points, scene,
                                   blending_weights=None, diffuse_rgb=None,
                                   training=False):
    return pt_render_diff_shadow_indirect_mlp(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, blending_weights, diffuse_rgb,
        diff_geo=False, speed_first=False, training=training,
    )


def pt_render_shadow_indirect_mlp_envmap(key, lgtSGs, specular_reflectance,
                                         roughness, diffuse_albedo, normal,
                                         viewdirs, points, scene,
                                         blending_weights=None, diffuse_rgb=None,
                                         speed_first=True, training=False):
    """2D constant-envmap light variant (reference :1496-1733)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "env2d"),
        shadow="indirect", diff_geo=False, sphere_fallback=False,
        light_type="constant", blending_weights=blending_weights,
        diffuse_rgb=diffuse_rgb, speed_first=speed_first, training=training,
    )


def pt_render_shadow_indirect_mlp_envmap_memsave(key, lgtSGs, specular_reflectance,
                                                 roughness, diffuse_albedo, normal,
                                                 viewdirs, points, scene,
                                                 blending_weights=None,
                                                 diffuse_rgb=None, training=False):
    return pt_render_shadow_indirect_mlp_envmap(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, blending_weights, diffuse_rgb,
        speed_first=False, training=training,
    )


def pt_render_diff_shadow_indirect_blend(key, lgtSGs, specular_reflectance,
                                         roughness, diffuse_albedo, normal,
                                         viewdirs, points, scene,
                                         blending_weights=None, diffuse_rgb=None,
                                         training=False):
    """K>1 base materials blended before sampling (reference :1736-1924)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="indirect", diff_geo=True, sphere_fallback=True,
        blending_weights=blending_weights, blend_materials=True,
        diffuse_rgb=diffuse_rgb, training=training,
    )


def pt_render_diff_shadow2_indirect_blend(key, lgtSGs, specular_reflectance,
                                          roughness, diffuse_albedo, normal,
                                          viewdirs, points, scene,
                                          blending_weights=None, diffuse_rgb=None,
                                          training=False):
    """Blend variant without the sphere fallback (reference :1927-2106)."""
    return pt_render_core(
        key, lgtSGs, specular_reflectance, roughness, diffuse_albedo, normal,
        viewdirs, points, scene, strategies=("cos", "brdf", "mix_sg"),
        shadow="indirect", diff_geo=True, sphere_fallback=False,
        blending_weights=blending_weights, blend_materials=True,
        diffuse_rgb=diffuse_rgb, training=training,
    )


def pt_render_with_sg(key, lgtSGs, specular_reflectance, roughness,
                      diffuse_albedo, normal, viewdirs, blending_weights=None,
                      diffuse_rgb=None, training=False):
    """Early prototype: 1 uniform-hemisphere sample through the warped-SG BRDF
    (reference :416-554)."""
    N = normal.shape[0]
    K = specular_reflectance.shape[0]
    wi = stop_grad(sampling.uniform_hemisphere_sampling(key, stop_grad(normal)))

    light = sampling.sg_light_eval(wi, lgtSGs)  # [N,3]

    # warped-SG BRDF evaluated at wi (K-lobe sum)
    normal_k = normal[:, None, :]
    viewdirs_k = viewdirs[:, None, :]
    wi_k = wi[:, None, :]

    inv_r4 = 1.0 / (roughness**4)  # [K,1]
    brdf_lambdas = 2.0 * inv_r4[None, :, :]  # [1,K,1]
    brdf_mus = jnp.broadcast_to(inv_r4 / np.pi, (K, 3))[None]  # [1,K,3]

    v_dot_lobe = jnp.clip(jnp.sum(normal_k * viewdirs_k, -1, keepdims=True), 0.0)
    warp_lobes = 2 * v_dot_lobe * normal_k - viewdirs_k
    warp_lobes = warp_lobes / (safe_norm(warp_lobes) + TINY_NUMBER)
    warp_lambdas = brdf_lambdas / (4 * v_dot_lobe + TINY_NUMBER)

    new_half = wi_k + viewdirs_k
    new_half = new_half / (safe_norm(new_half) + TINY_NUMBER)
    v_dot_h = jnp.clip(jnp.sum(viewdirs_k * new_half, -1, keepdims=True), 0.0)
    F = specular_reflectance[None] + (1.0 - specular_reflectance[None]) * jnp.power(
        2.0, -(5.55473 * v_dot_h + 6.8316) * v_dot_h
    )
    dot1 = jnp.clip(jnp.sum(wi_k * normal_k, -1, keepdims=True), 0.0)
    dot2 = jnp.clip(jnp.sum(viewdirs_k * normal_k, -1, keepdims=True), 0.0)
    k_ = (roughness + 1.0) ** 2 / 8.0
    G = (dot1 / (dot1 * (1 - k_) + k_ + TINY_NUMBER)) * (
        dot2 / (dot2 * (1 - k_) + k_ + TINY_NUMBER)
    )
    Moi = F * G / (4 * dot1 * dot2 + TINY_NUMBER)
    fs = (Moi * brdf_mus) * jnp.exp(
        warp_lambdas * (jnp.sum(wi_k * warp_lobes, -1, keepdims=True) - 1.0)
    )
    fs = fs[:, 0, :]  # K=1

    w_i_dot_n = jnp.clip(jnp.sum(wi * normal, -1, keepdims=True), 0.0)
    specular_rgb = jnp.clip(2 * np.pi * light * fs * w_i_dot_n, 0.0)
    if diffuse_rgb is None:
        diffuse_rgb = jnp.clip(2 * np.pi * light * (diffuse_albedo / np.pi) * w_i_dot_n, 0.0)
    return {
        "sg_rgb": specular_rgb + diffuse_rgb,
        "sg_specular_rgb": specular_rgb,
        "sg_diffuse_rgb": diffuse_rgb,
        "sg_diffuse_albedo": diffuse_albedo,
    }
