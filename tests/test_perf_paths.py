"""Perf-path equivalence: fused Pallas SDF kernel and shade compaction must
not change results (fp32 tolerance)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefii_tpu.config import parse_string
from nefii_tpu.models.idr import IDRNetwork
from nefii_tpu.models.implicit import ImplicitNetwork
from nefii_tpu.ops.pallas.fused_mlp import (
    build_fused_hidden,
    build_fused_sdf,
    build_fused_sdf_feature_grad,
)

from test_idr_forward import SMALL_CONF, _inputs


def test_fused_kernel_matches_jnp_interpret():
    net = ImplicitNetwork(
        feature_vector_size=512, d_in=3, d_out=1, dims=(512,) * 8,
        geometric_init=True, bias=0.6, skip_in=(4,), weight_norm=True,
        multires=6, use_last_as_f=True,
    )
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (700, 3)) * 0.5

    ref = net.sdf(params, pts)
    fused = build_fused_sdf(net, params, tile=256, interpret=True)(pts)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)

    href = net(params, pts)[:, 1:]
    hf = build_fused_hidden(net, params, tile=256, interpret=True)(pts)[:, :512]
    np.testing.assert_allclose(np.asarray(hf), np.asarray(href), atol=2e-6)

    # in-kernel-embedding variant must agree too
    fused_ik = build_fused_sdf(
        net, params, tile=256, interpret=True, embed_in_kernel=True
    )(pts)
    np.testing.assert_allclose(np.asarray(fused_ik), np.asarray(ref), atol=2e-6)


def test_fused_kernel_narrow_net():
    # non-flagship geometry: 4x256, skip at 2, multires 4
    net = ImplicitNetwork(
        feature_vector_size=256, d_in=3, d_out=1, dims=(256,) * 4,
        geometric_init=True, bias=0.5, skip_in=(2,), weight_norm=True,
        multires=4, use_last_as_f=True,
    )
    params = net.init_params(jax.random.PRNGKey(2))
    pts = jax.random.normal(jax.random.PRNGKey(3), (300, 3)) * 0.5
    ref = net.sdf(params, pts)
    fused = build_fused_sdf(net, params, tile=128, interpret=True)(pts)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(feature_vector_size=512, dims=(512,) * 8, skip_in=(4,), multires=6,
             use_last_as_f=True, bias=0.6),
        dict(feature_vector_size=256, dims=(256,) * 4, skip_in=(2,), multires=4,
             use_last_as_f=False, bias=0.5),
        dict(feature_vector_size=64, dims=(64,) * 3, skip_in=(1,), multires=0,
             use_last_as_f=True, bias=0.5),
    ],
    ids=["flagship-8x512", "narrow-no-lastf", "tiny-no-pe"],
)
def test_fused_sdf_feature_grad_matches_jnp(cfg):
    """The fused forward+input-gradient kernel must reproduce the jnp
    sdf_feature_grad (sdf, feature, spatial grad) — incl. the skip layer's
    split backward and the positional-encoding VJP."""
    net = ImplicitNetwork(d_in=3, d_out=1, geometric_init=True, weight_norm=True, **cfg)
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (700, 3)) * 0.5

    sdf_r, feat_r, grad_r = net.sdf_feature_grad(params, pts)
    sdf_f, feat_f, grad_f = build_fused_sdf_feature_grad(
        net, params, tile=128, interpret=True
    )(pts)
    np.testing.assert_allclose(np.asarray(sdf_f), np.asarray(sdf_r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat_r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grad_f), np.asarray(grad_r), atol=1e-5)


def test_freeze_geo_grads_match_constant_implicit():
    """freeze_geo prunes the implicit backward; the surviving rendering/
    material gradients must be EXACTLY what differentiating with the implicit
    params held constant gives (i.e. the pruning is a pure optimisation)."""
    conf = parse_string(SMALL_CONF).get_config("model")
    model = IDRNetwork.from_conf(conf)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs(S=16)
    key = jax.random.PRNGKey(1)

    def loss_from(out):
        return out["sg_rgb_values"].mean() + out["idr_rgb_values"].mean()

    def loss_full(p):
        return loss_from(model.forward(p, inputs, key, training=True, freeze_geo=True))

    grads = jax.grad(loss_full)(params)
    imp_flat, _ = jax.tree_util.tree_flatten(grads["implicit_network"])
    assert all(float(jnp.abs(g).sum()) == 0.0 for g in imp_flat)

    def loss_rm(p_rm):
        p = {"implicit_network": params["implicit_network"], **p_rm}
        return loss_from(model.forward(p, inputs, key, training=True, freeze_geo=True))

    grads_rm = jax.grad(loss_rm)(
        {k: params[k] for k in ("rendering_network", "envmap_material_network")}
    )
    for k in ("rendering_network", "envmap_material_network"):
        ga, _ = jax.tree_util.tree_flatten(grads[k])
        gb, _ = jax.tree_util.tree_flatten(grads_rm[k])
        for a, b in zip(ga, gb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_with_point_grad_boundaries():
    """Secondary-distillation gradient boundaries (reference
    implicit_differentiable_renderer.py:514-518, :533-540): the step detaches
    ONLY the normals gradient; the feature path stays attached, so implicit
    grads are nonzero with unfrozen geometry and exactly zero only when the
    run-level freeze_geo flag is set."""
    conf = parse_string(SMALL_CONF).get_config("model")
    model = IDRNetwork.from_conf(conf)
    params = model.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 3)) * 0.4
    dirs = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {"points": pts, "ray_dirs": dirs}

    def loss_fn(p, freeze_geo):
        out = model.forward(
            p, batch, jax.random.PRNGKey(4), with_point=True,
            freeze_geo=freeze_geo,
        )
        return jnp.abs(out["sg_rgb_values"] - out["idr_rgb_values"]).mean()

    # run-level frozen geometry: torch requires_grad=False -> zero grads
    grads = jax.grad(lambda p: loss_fn(p, True))(params)
    imp_flat, _ = jax.tree_util.tree_flatten(grads["implicit_network"])
    assert all(float(jnp.abs(g).sum()) == 0.0 for g in imp_flat)
    # material still learns
    assert float(jnp.abs(grads["envmap_material_network"]["lgtSGs"]).sum()) > 0

    # unfrozen geometry: the feature path keeps the implicit net attached
    grads_u = jax.grad(lambda p: loss_fn(p, False))(params)
    imp_flat_u, _ = jax.tree_util.tree_flatten(grads_u["implicit_network"])
    assert any(float(jnp.abs(g).sum()) > 0.0 for g in imp_flat_u)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in imp_flat_u)


def test_secondary_tracer_override():
    """secondary_ray_tracer: identical settings -> identical outputs; reduced
    fallback budgets -> same output structure, finite, and hit masks of the
    primary trace unchanged (it only affects the secondary fan-out)."""
    conf = parse_string(SMALL_CONF).get_config("model")
    base = IDRNetwork.from_conf(conf)
    same = dataclasses.replace(base, secondary_ray_tracer=base.ray_tracer)
    reduced = dataclasses.replace(
        base,
        secondary_ray_tracer=dataclasses.replace(
            base.ray_tracer, n_steps=8, n_rootfind_steps=2, sampler_budget=16
        ),
    )
    params = base.init_params(jax.random.PRNGKey(0))
    inputs = _inputs(S=64)
    key = jax.random.PRNGKey(1)

    out_b = base.forward(params, inputs, key)
    out_s = same.forward(params, inputs, key)
    for k in ("sg_rgb_values", "idr_rgb_values", "network_object_mask"):
        np.testing.assert_array_equal(np.asarray(out_b[k]), np.asarray(out_s[k]))

    out_r = reduced.forward(params, inputs, key)
    np.testing.assert_array_equal(
        np.asarray(out_b["network_object_mask"]),
        np.asarray(out_r["network_object_mask"]),
    )
    sg = np.asarray(out_r["sg_rgb_values"])
    assert np.isfinite(sg).all()
    # secondary-ray *directions* are sampled identically; only hit results
    # may differ under the reduced fallback
    np.testing.assert_array_equal(
        np.asarray(out_b["secondary_dir"]), np.asarray(out_r["secondary_dir"])
    )


def test_from_conf_secondary_ray_tracer_section():
    conf_text = SMALL_CONF.replace(
        "    ray_tracer\n",
        "    secondary_ray_tracer { n_steps = 12\n sampler_budget = 32 }\n    ray_tracer\n",
    )
    model = IDRNetwork.from_conf(parse_string(conf_text).get_config("model"))
    assert model.secondary_ray_tracer is not None
    assert model.secondary_ray_tracer.n_steps == 12
    assert model.secondary_ray_tracer.sampler_budget == 32
    # un-overridden fields inherit the main tracer's values
    assert (
        model.secondary_ray_tracer.sphere_tracing_iters
        == model.ray_tracer.sphere_tracing_iters
    )


def test_shade_compaction_multiray_training():
    """Ray-granularity compaction on the non-fast multi-ray (training) path:
    per-pixel means, masks, and the deterministic shaded quantities match the
    dense run whenever the budget covers the hit count; grads stay finite."""
    conf = parse_string(SMALL_CONF).get_config("model")
    dense_model = IDRNetwork.from_conf(conf)
    compact_model = dataclasses.replace(dense_model, shade_fraction=0.99)
    S, R = 48, 4
    inputs = dict(_inputs(S=S, R=R))
    center = jnp.asarray([32.0, 32.0])
    inputs["uv"] = center + (inputs["uv"] - center) * 3.0  # force some misses
    params = dense_model.init_params(jax.random.PRNGKey(0))

    out_d = dense_model.forward(
        params, inputs, jax.random.PRNGKey(1), training=True, freeze_geo=True
    )
    out_c = compact_model.forward(
        params, inputs, jax.random.PRNGKey(1), training=True, freeze_geo=True
    )
    # trace-derived masks are computed pre-compaction: identical
    np.testing.assert_array_equal(
        np.asarray(out_d["network_object_mask"]),
        np.asarray(out_c["network_object_mask"]),
    )
    m = np.asarray(out_d["network_object_mask"])
    assert 0 < m.sum() < S  # both hits and misses present
    # deterministic per-pixel outputs agree on hit pixels (MC rgb uses
    # shape-dependent random draws, so only the non-MC quantities are
    # ray-for-ray comparable)
    np.testing.assert_allclose(
        np.asarray(out_c["sg_diffuse_albedo_values"])[m],
        np.asarray(out_d["sg_diffuse_albedo_values"])[m], atol=1e-5,
    )
    assert np.isfinite(np.asarray(out_c["sg_rgb_values"])).all()

    # with R=1 a miss pixel has no shaded rays at all, so its value is the
    # deterministic background in both runs (at R>1 a miss PIXEL can still
    # contain hit rays whose MC draws are shape-dependent)
    inputs1 = dict(_inputs(S=S, R=1))
    inputs1["uv"] = center + (inputs1["uv"] - center) * 3.0
    out_d1 = dense_model.forward(
        params, inputs1, jax.random.PRNGKey(1), training=True, freeze_geo=True
    )
    out_c1 = compact_model.forward(
        params, inputs1, jax.random.PRNGKey(1), training=True, freeze_geo=True
    )
    m1 = np.asarray(out_d1["network_object_mask"])
    assert 0 < m1.sum() < S
    np.testing.assert_allclose(
        np.asarray(out_c1["sg_rgb_values"])[~m1],
        np.asarray(out_d1["sg_rgb_values"])[~m1], atol=1e-5,
    )

    def loss_fn(p):
        out = compact_model.forward(
            p, inputs, jax.random.PRNGKey(1), training=True, freeze_geo=True
        )
        return out["sg_rgb_values"].mean() + out["idr_rgb_values"].mean()

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)


def test_shade_compaction_matches_dense():
    conf = parse_string(SMALL_CONF).get_config("model")
    dense_model = IDRNetwork.from_conf(conf)
    compact_model = dataclasses.replace(dense_model, shade_fraction=0.99)
    # force an actual compaction budget < N
    S = 256
    inputs = dict(_inputs(S=S))
    # widen the pixel spread so a good fraction of rays miss the surface
    center = jnp.asarray([32.0, 32.0])
    inputs["uv"] = center + (inputs["uv"] - center) * 3.0
    params = dense_model.init_params(jax.random.PRNGKey(0))

    out_d = dense_model.forward(params, inputs, jax.random.PRNGKey(1))
    # budget = ceil(0.99*256) = 254 -> compaction active with 2 dropped rays
    out_c = compact_model.forward(params, inputs, jax.random.PRNGKey(1))

    hit_d = np.asarray(out_d["network_object_mask"])
    # all shaded rays that fit in the budget agree with dense; compare only
    # rays both runs shaded (hits are shaded first, so hits agree as long as
    # the budget covers them)
    n_hits = hit_d.sum()
    assert n_hits <= 254
    m = hit_d
    for k in ("sg_rgb_values", "idr_rgb_values", "sg_diffuse_albedo_values"):
        a = np.asarray(out_d[k])[m]
        b = np.asarray(out_c[k])[m]
        # MC sampling keys differ only through ray ordering inside the pt
        # renderer; shading inputs are identical per-ray, and the per-ray
        # sampler keys derive from position in the batch... so allow loose
        # tolerance on the MC outputs but exact agreement on albedo
        if k == "sg_diffuse_albedo_values":
            np.testing.assert_allclose(a, b, atol=1e-5)
    # miss rays get defaults in both
    np.testing.assert_allclose(
        np.asarray(out_c["sg_rgb_values"])[~m], np.asarray(out_d["sg_rgb_values"])[~m],
        atol=1e-5,
    )


def test_forward_overflow_counters():
    """forward_with_uv must surface the compaction budgets' overflow counts:
    zero for unbudgeted runs, positive when a budget is over-filled."""
    conf = parse_string(SMALL_CONF).get_config("model")
    model = IDRNetwork.from_conf(conf)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs(S=32)
    key = jax.random.PRNGKey(1)

    out = model.forward(params, inputs, key, training=True)
    for k in ("sampler_overflow", "minsdf_overflow", "shade_overflow",
              "secondary_overflow", "trace_overflow"):
        assert int(out[k]) == 0, (k, int(out[k]))

    # starve the secondary tracer's sampler budget: 3 strategies x 32 rays
    # of secondary fan-out, budget 1 -> unconverged secondary rays overflow
    starved = dataclasses.replace(
        model,
        secondary_ray_tracer=dataclasses.replace(
            model.ray_tracer, sphere_tracing_iters=0, sampler_budget=1
        ),
    )
    out_s = starved.forward(params, inputs, key, training=True)
    assert int(out_s["secondary_overflow"]) > 0

    # starve the mid-trace compaction: live rays beyond the budget counted
    comp = dataclasses.replace(
        model,
        ray_tracer=dataclasses.replace(
            model.ray_tracer, compact_after=1, compact_budget=1
        ),
    )
    out_c = comp.forward(params, inputs, key, training=True)
    assert int(out_c["trace_overflow"]) > 0


def test_indirect_fraction_model_level_bit_exact():
    """Model-level indirect_fraction: the vis/indirect compaction happens
    AFTER all MC sampling, so (unlike shade_fraction) no random-draw shape
    changes — the full forward is bit-identical to dense whenever the budget
    covers the hit count, and the conf knob parses."""
    conf = parse_string(
        SMALL_CONF.replace(
            "    render_type = pt_render_indirect_mlp",
            "    render_type = pt_render_indirect_mlp\n    indirect_fraction = 0.99",
        )
    ).get_config("model")
    compact_model = IDRNetwork.from_conf(conf)
    assert compact_model.indirect_fraction == 0.99
    dense_model = dataclasses.replace(compact_model, indirect_fraction=1.0)

    inputs = _inputs(S=48, R=4)
    params = dense_model.init_params(jax.random.PRNGKey(0))
    out_d = dense_model.forward(params, inputs, jax.random.PRNGKey(1),
                                training=False)
    out_c = compact_model.forward(params, inputs, jax.random.PRNGKey(1),
                                  training=False)
    assert int(out_c["indirect_overflow"]) == 0
    for k in ("sg_rgb_values", "idr_rgb_values", "sg_specular_rgb_values"):
        np.testing.assert_array_equal(
            np.asarray(out_d[k]), np.asarray(out_c[k]), err_msg=k)
