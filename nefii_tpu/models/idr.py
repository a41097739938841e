"""IDRNetwork — the composite forward pipeline.

TPU-native equivalent of the reference IDRNetwork
(model/implicit_differentiable_renderer.py:244-759): owns the five submodules
(implicit SDF net, IDR radiance net, envmap/material net, ray tracer, sample
network), the full per-pixel pipeline `forward_with_uv` (:312-501), the
secondary-point pipeline `forward_with_point` (:503-527), shading dispatch
`get_rbg_value` (:529-599), multi-ray-per-pixel reduction (:695-719), SG
background for miss rays (:646-692), and the 13-way render_type dispatch
(:721-759).

Differences by design (SURVEY.md §7.1):
  * Fixed shapes everywhere: instead of gathering `points[surface_mask]`,
    ALL rays are shaded and outputs are masked — the miss-shading cost is
    bounded and keeps XLA happy.
  * Params are an explicit pytree {implicit_network, rendering_network,
    envmap_material_network}; freeze semantics live in the optimizer masks
    and in the `freeze_geo` static flag (which controls the stop-gradient /
    second-order-AD boundary exactly like the reference's
    `state_freeze_geo`, :264-304).
  * Randomness (pixel jitter, MC sampling, eikonal points) is an explicit
    PRNG key threaded through `forward`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


from nefii_tpu.models.implicit import ImplicitNetwork
from nefii_tpu.models.material import EnvmapMaterialNetwork
from nefii_tpu.models.rendering import RenderingNetwork
from nefii_tpu.models.sample_network import sample_network
from nefii_tpu.ops import path_tracing as ptr
from nefii_tpu.ops import sampling
from nefii_tpu.ops.ray_tracing import RayTracer
from nefii_tpu.ops.sg import render_with_sg, safe_norm
from nefii_tpu.utils.camera import get_camera_params

stop_grad = jax.lax.stop_gradient

PT_RENDER_TYPES = {
    "path_tracing_sg": dict(),
    "path_tracing": dict(strategies=("cos", "brdf"), shadow=None),
    "path_tracing_shadow": dict(strategies=("cos", "brdf", "mix_sg"), shadow="hard"),
    "path_tracing_diff_shadow": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="soft", diff_geo=True,
        sphere_fallback=True,
    ),
    "pt_render_diff_shadow_indirect": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=True,
        sphere_fallback=True,
    ),
    "pt_render_diff_shadow_indirect_mlp": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=True,
    ),
    "pt_render_indirect_mlp": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=False,
    ),
    "pt_render_indirect_mlp_memsave": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=False,
        speed_first=False,
    ),
    "pt_render_shadow_indirect_mlp_envmap": dict(
        strategies=("cos", "brdf", "env2d"), shadow="indirect", diff_geo=False,
        light_type="constant",
    ),
    "pt_render_shadow_indirect_mlp_envmap_memsave": dict(
        strategies=("cos", "brdf", "env2d"), shadow="indirect", diff_geo=False,
        light_type="constant", speed_first=False,
    ),
    "pt_render_diff_shadow_indirect_blend": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=True,
        sphere_fallback=True, blend_materials=True,
    ),
    "pt_render_diff_shadow2_indirect_blend": dict(
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=True,
        blend_materials=True,
    ),
}

# Budget-overflow counters emitted by forward_with_uv (and, for the
# secondary-distillation step, forward_with_point): rays a compaction budget
# silently degraded to defaults. Single source of truth — spmd (psum specs),
# the trainer (warning + auto-escalation) and bench.py all import this.
OVERFLOW_KEYS = (
    "sampler_overflow", "minsdf_overflow", "shade_overflow",
    "secondary_overflow", "trace_overflow", "indirect_overflow",
    "cull_overflow", "rootfind_overflow",
)

# Demand counters emitted by forward_with_uv when measure_demand=True: the
# pre-budget ray count each compaction path would need. demand <= budget is
# exactly "the matching overflow counter is 0", so one dense probe render
# yields exact per-scene budget sizes (models/budgets.py sizes every knob
# from these; scripts/render.py --auto_budget and bench.py use it). Keys are
# absent from the output dict when measure_demand=False, keeping production
# programs (and their compile-cache entries) byte-identical.
DEMAND_KEYS = (
    "sampler_demand", "minsdf_demand", "shade_demand", "trace_demand",
    "rootfind_demand", "indirect_demand", "cull_demand",
    "secondary_sampler_demand", "secondary_minsdf_demand",
    "secondary_rootfind_demand", "secondary_trace_demand",
)


@dataclass(frozen=True)
class IDRNetwork:
    feature_vector_size: int
    implicit_network: ImplicitNetwork
    rendering_network: RenderingNetwork
    envmap_material_network: EnvmapMaterialNetwork
    ray_tracer: RayTracer
    object_bounding_sphere: float = 1.0
    render_type: str = "sg"
    fast_multi_ray: bool = False
    render_background: bool = False
    correct_normal: bool = False
    # TPU perf knobs (semantics-preserving):
    #  - use_fused_sdf: Pallas VMEM-resident MLP for the (no-grad) tracer path
    #  - shade_fraction: compact surviving rays to a static budget before
    #    shading (the reference gathers points[surface_mask] dynamically,
    #    :359; this is its fixed-shape analogue — 1.0 = shade all rays).
    #    Works on every path incl. multi-ray training: dropped rays scatter
    #    default (miss) values back before the per-pixel mean, so results
    #    are unchanged while the budget covers the hit count
    use_fused_sdf: bool = False
    fused_sdf_dtype: str = "float32"   # "bfloat16" = reference's fp16-autocast analogue
    #  - use_fused_trace: run the WHOLE bidirectional sphere-trace loop as one
    #    Pallas kernel (weights VMEM-resident across all iterations, per-tile
    #    early exit) — ops/pallas/fused_trace.py. Per-ray results identical to
    #    the jnp tracer; fallback sampler/min-SDF stages are unaffected.
    use_fused_trace: bool = False
    #  - remat_strategies: jax.checkpoint each MIS strategy's visibility/
    #    indirect/shading block during training — caps peak activation memory
    #    at ONE strategy's secondary MLP evals instead of all three, for
    #    ~1 extra forward per strategy in the backward. The memory valve that
    #    lets UNFROZEN-geometry training fit at the reference scale.
    remat_strategies: bool = False
    shade_fraction: float = 1.0
    #  - indirect_fraction: compact the secondary vis/indirect MLP chain to a
    #    static budget of HIT rays per MIS strategy (non-diff_geo "indirect"
    #    renders only). Hard visibility is 1-hit_mask and indirect radiance
    #    is masked to hits, so results are unchanged while the budget covers
    #    the per-strategy hit count; overflow hits degrade to 0-indirect,
    #    counted in indirect_overflow (trainer auto-escalates). 1.0 = dense.
    indirect_fraction: float = 1.0
    #  - secondary_fraction: horizon-cull the secondary TRACE to a static
    #    budget of secondary_fraction * 3*S*R rays, above-horizon rays first
    #    (eval only — training keeps the dense trace for the distillation
    #    buffers). Every strategy's contribution carries clip(wi.n, 0), so
    #    below-horizon rays contribute exactly 0 and skipping their trace is
    #    estimator-exact while the budget covers the above-horizon count;
    #    overflow rays degrade to unoccluded-no-indirect, counted in
    #    cull_overflow (exact iff 0). 1.0 = dense.
    secondary_fraction: float = 1.0
    #  - secondary_ray_tracer: tracer override for the secondary-ray fan-out
    #    (3 MIS strategies x S·R rays). The reference traces secondary rays
    #    with the SAME tracer (path_tracing_render.py:1332-1375); these rays
    #    only feed soft visibility + indirect radiance, so reduced fallback
    #    budgets are a quality/perf knob. None = reference semantics.
    secondary_ray_tracer: Optional[RayTracer] = None
    #  - measure_demand: emit the DEMAND_KEYS counters (probe mode for
    #    budget auto-sizing — see models/budgets.py). The tracers' own
    #    measure_demand flags must be set consistently; budgets.probe_model
    #    builds the whole configuration in one call.
    measure_demand: bool = False

    # ------------------------------------------------------------------
    @classmethod
    def from_conf(cls, conf) -> "IDRNetwork":
        """Build from a reference-schema `model{...}` config section."""
        fvs = conf.get_int("feature_vector_size")
        correct_normal = conf.get_bool("correct_normal", default=False)
        implicit = ImplicitNetwork(
            feature_vector_size=fvs, **conf.get_config("implicit_network").as_plain_dict()
        )
        rendering = RenderingNetwork(
            feature_vector_size=fvs, **conf.get_config("rendering_network").as_plain_dict()
        )
        material = EnvmapMaterialNetwork(
            correct_normal=correct_normal,
            feature_vector_size=fvs,
            **conf.get_config("envmap_material_network").as_plain_dict(),
        )
        tracer = RayTracer(**conf.get_config("ray_tracer").as_plain_dict())
        secondary_tracer = None
        try:
            sec_over = conf.get_config("secondary_ray_tracer").as_plain_dict()
        except Exception:
            sec_over = None
        if sec_over:
            base = conf.get_config("ray_tracer").as_plain_dict()
            base.update(sec_over)
            secondary_tracer = RayTracer(**base)
        return cls(
            feature_vector_size=fvs,
            implicit_network=implicit,
            rendering_network=rendering,
            envmap_material_network=material,
            ray_tracer=tracer,
            object_bounding_sphere=conf.get_float("ray_tracer.object_bounding_sphere"),
            render_type=conf.get_string("render_type", default="sg"),
            fast_multi_ray=conf.get_bool("fast_multi_ray", default=False),
            render_background=conf.get_bool("render_background", default=False),
            correct_normal=correct_normal,
            use_fused_sdf=conf.get_bool("use_fused_sdf", default=False),
            fused_sdf_dtype=conf.get_string("fused_sdf_dtype", default="float32"),
            use_fused_trace=conf.get_bool("use_fused_trace", default=False),
            remat_strategies=conf.get_bool("remat_strategies", default=False),
            shade_fraction=conf.get_float("shade_fraction", default=1.0),
            indirect_fraction=conf.get_float("indirect_fraction", default=1.0),
            secondary_fraction=conf.get_float("secondary_fraction", default=1.0),
            secondary_ray_tracer=secondary_tracer,
        )

    # ------------------------------------------------------------------
    def _sdf_closure(self, p_imp):
        """SDF evaluation closure for the tracer; Pallas-fused on TPU when
        enabled (the trace carries no gradients, so the forward-only kernel
        is safe)."""
        imp = self.implicit_network
        if self.use_fused_sdf:
            try:
                import jax as _jax

                if _jax.default_backend() == "tpu":
                    from nefii_tpu.ops.pallas.fused_mlp import build_fused_sdf

                    dtype = jnp.bfloat16 if self.fused_sdf_dtype == "bfloat16" else jnp.float32
                    return build_fused_sdf(imp, p_imp, dtype=dtype)
            except Exception as e:
                import warnings

                warnings.warn(f"use_fused_sdf=True but kernel build failed ({e}); "
                              "using the jnp SDF")
        return lambda x: imp.sdf(p_imp, x)

    def _sfg_closure(self, p_imp, value_only: bool):
        """(sdf, feature, spatial-grad) closure for the shading path.

        When all three outputs are values — frozen geometry (the shipped
        Step-2 workflow) or eval rendering — the fused Pallas forward+
        input-backward kernel replaces the XLA autodiff chain on TPU
        (measured 1.5x at the train step's 524k-point shading load).
        Otherwise the jnp path keeps parameter gradients and second-order
        AD intact."""
        imp = self.implicit_network
        if value_only and self.use_fused_sdf:
            try:
                import jax as _jax

                if _jax.default_backend() == "tpu":
                    from nefii_tpu.ops.pallas.fused_mlp import (
                        build_fused_sdf_feature_grad,
                    )

                    return build_fused_sdf_feature_grad(imp, stop_grad(p_imp))
            except Exception as e:
                import warnings

                warnings.warn(
                    f"use_fused_sdf=True but grad-kernel build failed ({e}); "
                    "using the jnp sdf_feature_grad"
                )
        return lambda pts: imp.sdf_feature_grad(p_imp, pts)

    def _fused_trace_closure(self, p_imp, tracer):
        """Whole-trace Pallas kernel for `tracer`, or None (jnp path).

        TPU-only; params must already be stop_grad'd (the trace carries no
        gradients in the reference either, :344-350)."""
        if not self.use_fused_trace:
            return None
        try:
            import jax as _jax

            if _jax.default_backend() == "tpu":
                from nefii_tpu.ops.pallas.fused_trace import build_fused_sphere_trace

                return build_fused_sphere_trace(self.implicit_network, p_imp, tracer)
        except Exception as e:
            # fall back to the jnp tracer, but say so — otherwise the user
            # benchmarks "the fused kernel" on a path that never ran
            import warnings

            warnings.warn(f"use_fused_trace=True but kernel build failed ({e}); "
                          "using the jnp tracer")
        return None

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "implicit_network": self.implicit_network.init_params(k1),
            "rendering_network": self.rendering_network.init_params(k2),
            "envmap_material_network": self.envmap_material_network.init_params(k3),
        }

    # ------------------------------------------------------------------
    def scene_fns(self, params: Dict[str, Any], value_only: bool = False) -> ptr.SceneFns:
        """Closures over params for the path tracer's model callbacks.

        `value_only=True` (frozen geometry / eval) lets `implicit_with_grad`
        use the fused Pallas forward+input-gradient kernel — the secondary
        visibility/indirect queries are 3x the primary shading load."""
        imp = self.implicit_network
        rend = self.rendering_network
        p_imp = params["implicit_network"]
        p_rend = params["rendering_network"]

        # the tracer runs under no-grad in the reference (:344-350, secondary
        # traces under torch.no_grad in the shaders) — cut params here so AD
        # never differentiates through the trace (also required for the
        # forward-only Pallas kernel)
        sdf_fn = self._sdf_closure(stop_grad(p_imp))

        sec_tracer = self.secondary_ray_tracer or self.ray_tracer
        sec_trace_fn = self._fused_trace_closure(stop_grad(p_imp), sec_tracer)

        def trace(origins, dirs, key, training):
            res = sec_tracer(
                sdf_fn,
                origins,
                jnp.ones((origins.shape[0],), bool),
                dirs[:, None, :],
                key=key,
                training=training,
                sphere_trace_fn=sec_trace_fn,
            )
            out = (
                res.points, res.object_mask, res.dists, res.n_evals,
                res.sampler_overflow + res.minsdf_overflow
                + res.trace_overflow + res.rootfind_overflow,
            )
            if sec_tracer.measure_demand:
                # granular demands for budget auto-sizing (pt_render_core
                # consumes res[5:9] in measure mode)
                out = out + (res.sampler_demand, res.minsdf_demand,
                             res.rootfind_demand, res.trace_demand)
            return out

        return ptr.SceneFns(
            trace=trace,
            implicit=lambda pts: imp(p_imp, pts),
            implicit_grad=lambda pts: imp.gradient(p_imp, pts),
            radiance=lambda pts, n, v, f: rend(p_rend, pts, n, v, f),
            feature_size=self.feature_vector_size,
            bounding_sphere=self.object_bounding_sphere,
            implicit_with_grad=self._sfg_closure(p_imp, value_only),
        )

    # ------------------------------------------------------------------
    def forward(
        self,
        params: Dict[str, Any],
        inputs: Dict[str, jnp.ndarray],
        key: jax.Array,
        *,
        training: bool = False,
        freeze_geo: bool = False,
        fake_roughness: bool = False,
        fake_specular: bool = False,
        with_point: bool = False,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        if with_point:
            return self.forward_with_point(
                params, inputs, key, freeze_geo=freeze_geo,
                fake_roughness=fake_roughness, fake_specular=fake_specular,
            )
        return self.forward_with_uv(
            params, inputs, key, training=training, freeze_geo=freeze_geo,
            fake_roughness=fake_roughness, fake_specular=fake_specular,
        )

    __call__ = forward

    # ------------------------------------------------------------------
    def forward_with_uv(
        self, params, inputs, key, *, training=False, freeze_geo=False,
        fake_roughness=False, fake_specular=False,
    ):
        if training and freeze_geo:
            # the reference freezes geometry with requires_grad_(False)
            # (implicit_differentiable_renderer.py:264-275); cutting the
            # param leaves here prunes the whole implicit backward from the
            # compiled step instead of computing gradients the optimizer
            # mask would zero
            params = dict(params, implicit_network=stop_grad(params["implicit_network"]))

        intrinsics = inputs["intrinsics"]
        uv = inputs["uv"]
        pose = inputs["pose"]
        object_mask = inputs["object_mask"].reshape(-1)

        multi_ray = uv.ndim == 4
        R = 1
        if multi_ray:
            B, S, R, D = uv.shape
            if not self.fast_multi_ray:
                uv = uv.reshape(B, S * R, D)
                object_mask = jnp.broadcast_to(
                    object_mask.reshape(B, S, 1), (B, S, R)
                ).reshape(-1)
            else:
                uv = uv.mean(axis=2)

        ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
        batch_size, num_pixels, _ = ray_dirs.shape
        N = batch_size * num_pixels

        imp = self.implicit_network
        p_imp = params["implicit_network"]

        k_trace, k_eik, k_render = jax.random.split(key, 3)

        # trace (no gradients through the tracer — reference :344-350)
        sdf_fn = self._sdf_closure(stop_grad(p_imp))
        trace_res = self.ray_tracer(
            lambda x: stop_grad(sdf_fn(x)),
            stop_grad(cam_loc),
            object_mask,
            stop_grad(ray_dirs),
            key=k_trace,
            training=training,
            sphere_trace_fn=self._fused_trace_closure(stop_grad(p_imp), self.ray_tracer),
        )
        points = stop_grad(trace_res.points)
        network_object_mask = trace_res.object_mask
        dists = stop_grad(trace_res.dists)

        sdf_output = imp(p_imp, points)[:, 0:1]
        ray_dirs_flat = ray_dirs.reshape(-1, 3)
        cam_flat = jnp.broadcast_to(
            cam_loc[:, None, :], (batch_size, num_pixels, 3)
        ).reshape(-1, 3)

        grad_theta = None
        if training and not freeze_geo:
            surface_mask = network_object_mask & object_mask
            # eikonal sample points: uniform in the bounding box + pixel points
            # (eik_override: test hook injecting fixed points so the full
            # training gradient can be compared head-to-head with torch)
            n_eik = N // 2
            eik_pts = inputs.get("eik_override")
            if eik_pts is None:
                eik_pts = jax.random.uniform(
                    k_eik, (n_eik, 3),
                    minval=-self.object_bounding_sphere,
                    maxval=self.object_bounding_sphere,
                )
            else:
                eik_pts = jnp.asarray(eik_pts)
            eik_all = jnp.concatenate([eik_pts, stop_grad(points)], axis=0)
            grad_theta = imp.gradient(p_imp, eik_all)

            surface_grad = stop_grad(imp.gradient(p_imp, points))
            differentiable_points = sample_network(
                sdf_output,
                stop_grad(sdf_output),
                surface_grad,
                dists[:, None],
                cam_flat,
                ray_dirs_flat,
            )
        else:
            surface_mask = network_object_mask
            differentiable_points = points

        view_dirs = -ray_dirs_flat

        # optional hit-compaction: shade only a static-size budget of rays,
        # surviving (hit) rays first — the fixed-shape analogue of the
        # reference's dynamic points[surface_mask] gather (:359). Overflow
        # hits beyond the budget fall back to default outputs.
        budget = N
        # Ray-granularity compaction works for the non-fast multi-ray path
        # too: dropped rays scatter back their default (miss) values BEFORE
        # the per-pixel mean, exactly like genuine miss rays, and hits are
        # selected first — so results are unchanged whenever the budget
        # covers the hit count (the reference shades only points
        # [surface_mask], :359; overflow hits beyond the budget degrade to
        # defaults, the same accounting as the sampler/min-SDF budgets).
        if self.shade_fraction < 1.0:
            budget = min(max(int(N * self.shade_fraction + 0.5), 128), N)
        compact = budget < N
        shade_overflow = jnp.int32(0)
        shade_demand = (surface_mask.sum().astype(jnp.int32)
                        if self.measure_demand else 0)
        if compact:
            order = jnp.argsort(~surface_mask, stable=True)
            sel = order[:budget]
            shade_pts = differentiable_points[sel]
            shade_view = view_dirs[sel]
            # hit rays beyond the budget degrade to defaults — count them so
            # the trainer can warn (results are exact iff this stays 0)
            shade_overflow = jnp.maximum(
                surface_mask.sum().astype(jnp.int32) - budget, 0
            )
        else:
            sel = None
            shade_pts, shade_view = differentiable_points, view_dirs

        ret = self.get_rbg_value(
            params, shade_pts, shade_view, k_render,
            multi_ray_R=(R if (multi_ray and self.fast_multi_ray) else None),
            training=training, freeze_geo=freeze_geo,
            fake_roughness=fake_roughness, fake_specular=fake_specular,
        )

        if multi_ray and self.fast_multi_ray:
            # shaded quantities come back at budget*R; reduce to per-pixel means
            for k in (
                "idr_rgb", "sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb",
                "sg_diffuse_albedo",
            ):
                ret[k] = self.mean_pixel(ret[k], budget, R)
            if self.envmap_material_network.roughness_mlp:
                ret["sg_roughness"] = self.mean_pixel(ret["sg_roughness"], budget, R)
            if self.envmap_material_network.specular_mlp and not self.envmap_material_network.fix_specular_albedo:
                ret["sg_specular_reflectance"] = self.mean_pixel(
                    ret["sg_specular_reflectance"], budget, R
                )
            if ret.get("sg_blending_weights") is not None:
                ret["sg_blending_weights"] = self.mean_pixel(
                    ret["sg_blending_weights"], budget, R
                )

        if compact:
            # scatter per-ray outputs back to dense [N]; rays outside the
            # budget keep zeros (masked to defaults below). Secondary arrays
            # stay at budget size (only used for self-distillation).
            def scatter(v):
                if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == budget:
                    dense = jnp.zeros((N,) + v.shape[1:], v.dtype)
                    return dense.at[sel].set(v)
                return v
            for k in list(ret.keys()):
                if not k.startswith("secondary"):
                    ret[k] = scatter(ret[k])
            surface_mask = jnp.zeros((N,), bool).at[sel].set(surface_mask[sel])

        # mask: non-surface pixels get the defaults (ones/zeros, :400-407)
        m = surface_mask[:, None]
        idr_rgb_values = jnp.where(m, ret["idr_rgb"], 1.0)
        sg_rgb_values = jnp.where(m, ret["sg_rgb"], 1.0)
        normal_values = jnp.where(m, ret["normals"], 1.0)
        sg_diffuse_rgb_values = jnp.where(m, ret["sg_diffuse_rgb"], 1.0)
        sg_diffuse_albedo_values = jnp.where(m, ret["sg_diffuse_albedo"], 1.0)
        sg_specular_rgb_values = jnp.where(m, ret["sg_specular_rgb"], 0.0)

        sg_roughness = ret["sg_roughness"]
        sg_blend = ret.get("sg_blending_weights")
        if not self.envmap_material_network.roughness_mlp:
            if sg_blend is not None:
                sg_roughness = (sg_roughness[None] * sg_blend[..., None]).sum(-2)
            else:
                sg_roughness = jnp.broadcast_to(sg_roughness[0][None, :], (m.shape[0], 1))
        sg_roughness_values = jnp.where(m, sg_roughness, 0.0)

        sg_spec = ret["sg_specular_reflectance"]
        if not self.envmap_material_network.specular_mlp or self.envmap_material_network.fix_specular_albedo:
            if sg_blend is not None and not self.envmap_material_network.fix_specular_albedo:
                sg_spec = (sg_spec[None] * sg_blend[..., None]).sum(-2)
            else:
                sg_spec = jnp.broadcast_to(sg_spec[0][None, :], (m.shape[0], 3))
        sg_specular_reflection_values = jnp.where(m, sg_spec, 0.0)

        if self.render_background:
            bg_mask = ~surface_mask
            bg_rgb = self.get_background_rgb(params, ray_dirs_flat)
            sg_rgb_values = jnp.where(bg_mask[:, None], bg_rgb, sg_rgb_values)

        output = {
            "points": points,
            "idr_rgb_values": idr_rgb_values,
            "sg_rgb_values": sg_rgb_values,
            "normal_values": normal_values,
            "sdf_output": sdf_output,
            "network_object_mask": network_object_mask,
            "object_mask": object_mask,
            "grad_theta": grad_theta,
            "sg_diffuse_rgb_values": sg_diffuse_rgb_values,
            "sg_diffuse_albedo_values": sg_diffuse_albedo_values,
            "sg_specular_rgb_values": sg_specular_rgb_values,
            "sg_roughness_values": sg_roughness_values,
            "sg_specular_reflection_values": sg_specular_reflection_values,
            "secondary_points": ret.get("secondary_points"),
            "secondary_mask": ret.get("secondary_mask"),
            "secondary_dir": ret.get("secondary_dir"),
            # SDF point-samples actually executed (primary trace + secondary
            # traces + visibility queries) — the bench's ray-samples metric
            "n_sdf_evals": trace_res.n_evals + ret.get("n_sdf_evals", 0),
            # budget-overflow counters: rays a compaction budget silently
            # degraded to defaults. All zero <=> the budgets were exact.
            "sampler_overflow": trace_res.sampler_overflow,
            "minsdf_overflow": trace_res.minsdf_overflow,
            "shade_overflow": shade_overflow,
            "secondary_overflow": ret.get("n_overflow", jnp.int32(0)),
            "trace_overflow": trace_res.trace_overflow,
            "indirect_overflow": ret.get("n_indirect_overflow", jnp.int32(0)),
            "cull_overflow": ret.get("n_cull_overflow", jnp.int32(0)),
            "rootfind_overflow": trace_res.rootfind_overflow,
        }

        if self.measure_demand:
            # pre-budget demand counters for auto-sizing (see DEMAND_KEYS)
            z = jnp.int32(0)
            output.update({
                "sampler_demand": jnp.asarray(trace_res.sampler_demand, jnp.int32),
                "minsdf_demand": jnp.asarray(trace_res.minsdf_demand, jnp.int32),
                "shade_demand": jnp.asarray(shade_demand, jnp.int32),
                "trace_demand": jnp.asarray(trace_res.trace_demand, jnp.int32),
                "rootfind_demand": jnp.asarray(trace_res.rootfind_demand, jnp.int32),
                "indirect_demand": ret.get("n_indirect_demand", z),
                "cull_demand": ret.get("n_cull_demand", z),
                "secondary_sampler_demand": ret.get("n_sec_sampler_demand", z),
                "secondary_minsdf_demand": ret.get("n_sec_minsdf_demand", z),
                "secondary_rootfind_demand": ret.get("n_sec_rootfind_demand", z),
                "secondary_trace_demand": ret.get("n_sec_trace_demand", z),
            })

        if multi_ray and not self.fast_multi_ray:
            BS = (B * S)
            for k in (
                "idr_rgb_values", "sg_rgb_values", "network_object_mask",
                "object_mask", "sg_diffuse_rgb_values", "sg_diffuse_albedo_values",
                "sg_specular_rgb_values", "sdf_output", "points",
                "sg_roughness_values", "sg_specular_reflection_values",
            ):
                output[k] = self.mean_pixel(output[k], BS, R)
            output["normal_values"] = self.mean_pixel(
                output["normal_values"], BS, R, vector=True
            )

        return output

    # ------------------------------------------------------------------
    def forward_with_point(
        self, params, inputs, key, *, freeze_geo=False,
        fake_roughness=False, fake_specular=False,
    ):
        """Secondary self-distillation forward (reference
        implicit_differentiable_renderer.py:503-527).

        The reference temporarily sets state_freeze_geo=True for this step
        (:514-518), which detaches ONLY the normals gradient
        (gradient(points, detach=True), :533-540). feature_vectors =
        implicit_network(points)[:,1:] stays attached, so in
        unfrozen-geometry runs the idr optimizer trains the implicit net
        through the feature path during secondary steps. Implicit params
        are cut entirely only when the run-level freeze_geometry flag is
        set (requires_grad=False in the reference, :264-268)."""
        if freeze_geo:
            params = dict(
                params, implicit_network=stop_grad(params["implicit_network"])
            )

        points = inputs["points"]      # [N,R,3]
        ray_dirs = inputs["ray_dirs"]  # [N,R,3]
        N, R, _ = points.shape
        points = points.reshape(-1, 3)
        ray_dirs = ray_dirs.reshape(-1, 3)

        ret = self.get_rbg_value(
            params, points, -ray_dirs, key,
            training=True, freeze_geo=freeze_geo, detach_normals=True,
            fake_roughness=fake_roughness, fake_specular=fake_specular,
            wi_override=inputs.get("wi_override"),
        )
        return {
            "idr_rgb_values": self.mean_pixel(ret["idr_rgb"], N, R),
            "sg_rgb_values": self.mean_pixel(ret["sg_rgb"], N, R),
            # the distillation step's own secondary trace runs through the
            # budgeted fallbacks too — surface its overflow so the trainer's
            # counters/warning/auto-escalation see it (exact iff 0)
            "secondary_overflow": ret.get("n_overflow", jnp.int32(0)),
            "indirect_overflow": ret.get("n_indirect_overflow", jnp.int32(0)),
        }

    # ------------------------------------------------------------------
    def get_rbg_value(
        self, params, points, view_dirs, key, multi_ray_R=None,
        *, training=False, freeze_geo=False, detach_normals=None,
        fake_roughness=False, fake_specular=False, wi_override=None,
    ):
        """Shading dispatch (reference :529-599). points/view_dirs [N,3].

        `detach_normals` mirrors the reference's gradient detach flag
        (`gradient(points, self.state_freeze_geo or not self.training)`,
        :537): it cuts only the normals path, while the feature path's
        attachment is governed by `freeze_geo`/`training` (value_only)."""
        imp = self.implicit_network
        p_imp = params["implicit_network"]
        value_only = freeze_geo or not training
        if detach_normals is None:
            detach_normals = value_only

        # one fused forward+backward gives features AND normals (vs the
        # reference's two forwards + double-backprop, :533-540); in
        # value-only contexts the Pallas grad kernel takes over on TPU
        _, feature_vectors, g = self._sfg_closure(p_imp, value_only)(points)
        if self.feature_vector_size == 0:
            feature_vectors = None
        if detach_normals:
            g = stop_grad(g)
        normals = g / (safe_norm(g) + 1e-6)
        view_dirs = view_dirs / (safe_norm(view_dirs) + 1e-6)

        if self.correct_normal:
            normals = self.envmap_material_network.apply_correct_normal(
                params["envmap_material_network"], normals, points
            )

        ret = {"normals": normals}

        idr_rgb = self.rendering_network(
            params["rendering_network"], points, normals, view_dirs, feature_vectors
        )
        mat = self.envmap_material_network(
            params["envmap_material_network"], points, feature_vectors, normals,
            fake_roughness=fake_roughness, fake_specular=fake_specular,
        )

        if multi_ray_R is not None:
            # fast_multi_ray: shade once, broadcast to R jittered MC samples
            R = multi_ray_R
            N = idr_rgb.shape[0]

            def rep(x):
                return jnp.broadcast_to(x[:, None, :], (N, R, x.shape[-1])).reshape(N * R, -1)

            idr_rgb = rep(idr_rgb)
            points = rep(points)
            normals = rep(normals)
            view_dirs = rep(view_dirs)
            mat["sg_diffuse_albedo"] = rep(mat["sg_diffuse_albedo"])
            em = self.envmap_material_network
            if em.specular_mlp and not em.fix_specular_albedo:
                mat["sg_specular_reflectance"] = rep(mat["sg_specular_reflectance"])
            if em.roughness_mlp:
                mat["sg_roughness"] = rep(mat["sg_roughness"])
            if mat.get("sg_blending_weights") is not None:
                mat["sg_blending_weights"] = rep(mat["sg_blending_weights"])

        ret["idr_rgb"] = idr_rgb

        if self.render_type == "sg":
            sg_ret = render_with_sg(
                mat["sg_lgtSGs"], mat["sg_specular_reflectance"],
                mat["sg_roughness"], mat["sg_diffuse_albedo"],
                normals, view_dirs, blending_weights=mat["sg_blending_weights"],
            )
        elif self.render_type == "path_tracing_sg":
            sg_ret = ptr.pt_render_with_sg(
                key, mat["sg_lgtSGs"], mat["sg_specular_reflectance"],
                mat["sg_roughness"], mat["sg_diffuse_albedo"], normals,
                view_dirs, blending_weights=mat["sg_blending_weights"],
                training=training,
            )
        else:
            opts = PT_RENDER_TYPES[self.render_type]
            scene = self.scene_fns(params, value_only=value_only)
            sg_ret = ptr.pt_render_core(
                key, mat["sg_lgtSGs"], mat["sg_specular_reflectance"],
                mat["sg_roughness"], mat["sg_diffuse_albedo"], normals,
                view_dirs, points, scene,
                blending_weights=mat["sg_blending_weights"],
                training=training, remat_strategies=self.remat_strategies,
                wi_override=wi_override,
                indirect_fraction=self.indirect_fraction,
                secondary_fraction=self.secondary_fraction,
                measure_demand=self.measure_demand,
                **opts,
            )

        ret.update(sg_ret)
        ret.update(
            {
                "sg_roughness": mat["sg_roughness"],
                "sg_specular_reflectance": mat["sg_specular_reflectance"],
                "sg_blending_weights": mat["sg_blending_weights"],
            }
        )
        return ret

    # ------------------------------------------------------------------
    def get_background_rgb(self, params, light_dir: jnp.ndarray) -> jnp.ndarray:
        """Envmap radiance along miss rays (reference :646-692)."""
        em = self.envmap_material_network
        lgt = em.get_lgtSGs(params["envmap_material_network"])
        if em.light_type == "sg":
            return sampling.sg_light_eval(light_dir, lgt)
        return sampling.envmap_lookup(light_dir, lgt)

    # ------------------------------------------------------------------
    @staticmethod
    def mean_pixel(x: jnp.ndarray, bs: int, r: int, vector: bool = False) -> jnp.ndarray:
        """Reduce per-ray values [bs*r, ...] to per-pixel [bs, ...] (:695-719)."""
        no_dim = x.ndim == 1
        if no_dim:
            x = x[:, None]
        d = x.shape[-1]
        x = x.reshape(bs, r, d)
        if vector:
            x = x[:, 0, :]
        elif x.dtype == jnp.bool_:
            x = jnp.all(x, axis=1)
        else:
            x = jnp.mean(x, axis=1)
        if no_dim:
            x = x[:, 0]
        return x

    # ------------------------------------------------------------------
    def render_sg_rgb(self, params, mask, normals, view_dirs, diffuse_albedo):
        """Closed-form SG shading of externally supplied normals/albedo
        (reference :601-644; used by geometry-stage visualisation)."""
        normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-6)
        view_dirs = view_dirs / (jnp.linalg.norm(view_dirs, axis=-1, keepdims=True) + 1e-6)
        em = self.envmap_material_network
        p = params["envmap_material_network"]
        lgt = em.get_lgtSGs(p)
        roughness, spec = em.get_base_materials(p)
        sg_ret = render_with_sg(
            lgt, spec, roughness, diffuse_albedo, normals, view_dirs
        )
        m = mask[:, None]
        return {
            "sg_rgb_values": jnp.where(m, sg_ret["sg_rgb"], 1.0),
            "sg_diffuse_rgb_values": jnp.where(m, sg_ret["sg_diffuse_rgb"], 1.0),
            "sg_diffuse_albedo_values": diffuse_albedo,
            "sg_specular_rgb_values": jnp.where(m, sg_ret["sg_specular_rgb"], 1.0),
            "sg_roughness": roughness,
            "sg_specular_reflectance": spec,
            "sg_blending_weights": None,
        }
