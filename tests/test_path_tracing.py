"""Path-tracer tests: MC estimators converge to quadrature ground truth,
visibility/indirect combination is correct, gradients flow where they should."""

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.ops import path_tracing as pt
from nefii_tpu.ops import sampling
from nefii_tpu.ops.ray_tracing import RayTracer


def _light():
    # two SG lobes, one bright overhead, one dim sideways
    return jnp.array(
        [
            [0.0, 0.0, 1.0, 12.0, 1.5, 1.2, 0.9],
            [1.0, 0.0, 0.2, 6.0, 0.4, 0.5, 0.6],
        ]
    )


def _numeric_render(lgt, albedo, rough, spec, normal, view, n=600_000, seed=0):
    """Brute-force MC of the rendering equation over the hemisphere."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v[v @ normal > 0]
    wi = jnp.asarray(v.astype(np.float32))
    nn = jnp.tile(jnp.asarray(normal, jnp.float32)[None], (wi.shape[0], 1))
    vv = jnp.tile(jnp.asarray(view, jnp.float32)[None], (wi.shape[0], 1))
    L = sampling.sg_light_eval(wi, lgt)  # [P,3]
    cos = jnp.clip(jnp.sum(wi * nn, -1, keepdims=True), 0.0)
    fs = pt.ggx_brdf_direct(wi, nn, vv, jnp.full((wi.shape[0], 1), rough), jnp.full((wi.shape[0], 3), spec))
    diffuse = (albedo / np.pi) * L * cos
    specular = fs * L * cos
    area = 2 * np.pi
    return (
        np.asarray(diffuse.mean(0)) * area,
        np.asarray(specular.mean(0)) * area,
    )


def test_pt_render_converges_to_quadrature():
    lgt = _light()
    normal = np.array([0.0, 0.0, 1.0])
    view = np.array([np.sin(0.4), 0.0, np.cos(0.4)])
    albedo, rough, spec = 0.6, 0.5, 0.04

    n_pts = 4096
    nrm = jnp.tile(jnp.asarray(normal, jnp.float32)[None], (n_pts, 1))
    vw = jnp.tile(jnp.asarray(view, jnp.float32)[None], (n_pts, 1))
    alb = jnp.full((n_pts, 3), albedo)

    # average over many keys: each call is 1 sample/strategy/point
    def one(key):
        out = pt.pt_render(
            key, lgt, jnp.full((1, 3), spec), jnp.full((1, 1), rough), alb, nrm, vw
        )
        return out["sg_diffuse_rgb"].mean(0), out["sg_specular_rgb"].mean(0)

    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    d, s = jax.lax.map(jax.jit(one), keys)
    d, s = np.asarray(d.mean(0)), np.asarray(s.mean(0))

    d_ref, s_ref = _numeric_render(lgt, albedo, rough, spec, normal, view)
    np.testing.assert_allclose(d, d_ref, rtol=0.05)
    np.testing.assert_allclose(s, s_ref, rtol=0.08)


def _mock_scene(sdf_fn, radiance_const=(0.2, 0.5, 0.8), feature_size=0):
    tracer = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=16)

    def trace(origins, dirs, key, training):
        res = tracer(sdf_fn, origins, jnp.ones(origins.shape[0], bool), dirs[:, None, :],
                     key=key, training=training)
        return res.points, res.object_mask, res.dists

    def implicit(pts):
        return sdf_fn(pts)[:, None]

    def implicit_grad(pts):
        return jax.grad(lambda p: sdf_fn(p).sum())(pts)

    def radiance(pts, normals, view_dirs, feats):
        return jnp.tile(jnp.asarray(radiance_const), (pts.shape[0], 1))

    return pt.SceneFns(trace, implicit, implicit_grad, radiance, feature_size, 1.0)


def test_pt_render_shadow_blocks_occluded_dirs():
    # occluder: sphere radius 0.3 at origin; shading point to its -z side
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 512
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))  # faces the occluder
    vw = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]) * -1, (n, 1))

    out = pt.pt_render_shadow(
        jax.random.PRNGKey(0), _light(), jnp.full((1, 3), 0.04),
        jnp.full((1, 1), 0.4), jnp.full((n, 3), 0.5), nrm, vw, pts, scene,
    )
    sec_mask = np.asarray(out["secondary_mask"])  # [3, n, 1]
    sec_dir = np.asarray(out["secondary_dir"])    # [3, n, 3]
    # rays pointing nearly straight up (toward the sphere) must be blocked
    up = sec_dir[..., 2] > 0.9
    assert sec_mask[..., 0][up].mean() > 0.95
    # rays at grazing angles away from the sphere must be visible
    side = np.abs(sec_dir[..., 2]) < 0.25
    assert sec_mask[..., 0][side].mean() < 0.05


def test_indirect_light_substitution():
    """Fully-occluded directions must receive the radiance-cache color."""
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    c = (0.3, 0.6, 0.9)
    scene = _mock_scene(sdf_fn, radiance_const=c)
    n = 256
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    vw = nrm

    # nearly-dark light so direct contribution is negligible
    dark = jnp.array([[0.0, 0.0, 1.0, 10.0, 1e-5, 1e-5, 1e-5]])
    out = pt.pt_render_indirect_mlp(
        jax.random.PRNGKey(1), dark, jnp.full((1, 3), 0.0),
        jnp.full((n, 1), 0.9), jnp.full((n, 3), np.pi), nrm, vw, pts, scene,
    )
    # diffuse term with albedo=pi: sum_i w_i * light_all * cos / pdf.
    # For blocked dirs light_all == radiance const -> diffuse approximates c
    # times the hemisphere-average of blocked fraction; just check channel
    # RATIOS match the injected color (shadow geometry cancels).
    d = np.asarray(out["sg_diffuse_rgb"]).mean(0)
    assert d[0] > 1e-4
    np.testing.assert_allclose(d / d[0], np.asarray(c) / c[0], rtol=0.02)


def test_gradients_flow_to_light_not_pdf():
    n = 64
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    vw = nrm
    alb = jnp.full((n, 3), 0.5)

    def loss(lgt):
        out = pt.pt_render(
            jax.random.PRNGKey(0), lgt, jnp.full((1, 3), 0.04),
            jnp.full((1, 1), 0.5), alb, nrm, vw,
        )
        return out["sg_rgb"].sum()

    g = jax.grad(loss)(_light())
    assert bool(jnp.all(jnp.isfinite(g)))
    # mus receive gradient
    assert float(jnp.abs(g[:, 4:]).sum()) > 0
    # lobes+lambdas too (through sg_light_eval), but pdf path is cut:
    # verify the value is an unbiased estimate independent of pdf grads by
    # checking grad wrt roughness exists only through fs (finite)
    def loss_r(r):
        out = pt.pt_render(
            jax.random.PRNGKey(0), _light(), jnp.full((1, 3), 0.04),
            jnp.full((1, 1), r), alb, nrm, vw,
        )
        return out["sg_specular_rgb"].sum()

    gr = jax.grad(loss_r)(jnp.float32(0.5))
    assert bool(jnp.isfinite(gr))


def test_envmap_variant_runs():
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 128
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    lgtMap = jnp.ones((8, 16, 3)) * 0.5
    out = pt.pt_render_shadow_indirect_mlp_envmap(
        jax.random.PRNGKey(2), lgtMap, jnp.full((1, 3), 0.04),
        jnp.full((n, 1), 0.5), jnp.full((n, 3), 0.5), nrm, nrm, pts, scene,
    )
    assert out["sg_rgb"].shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(out["sg_rgb"])))


def test_memsave_matches_speed_first():
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 128
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    args = (
        _light(), jnp.full((1, 3), 0.04), jnp.full((n, 1), 0.5),
        jnp.full((n, 3), 0.5), nrm, nrm, pts, scene,
    )
    fast = pt.pt_render_indirect_mlp(jax.random.PRNGKey(3), *args)
    slow = pt.pt_render_indirect_mlp_memsave(jax.random.PRNGKey(3), *args)
    np.testing.assert_allclose(
        np.asarray(fast["sg_rgb"]), np.asarray(slow["sg_rgb"]), atol=1e-4
    )


def test_blend_variants_equal_preblended_estimator():
    """K>1 base materials are blended per-point BEFORE sampling (reference
    path_tracing_render.py:1760-1764), so the blend variants must equal the
    same estimator run on pre-blended per-point roughness/specular with the
    same key; shadow2 only drops the sphere fallback."""
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 256
    key = jax.random.PRNGKey(7)
    rng = np.random.RandomState(0)

    spec_k = jnp.asarray([[0.04, 0.04, 0.04], [0.3, 0.25, 0.2]], jnp.float32)
    rough_k = jnp.asarray([[0.2], [0.7]], jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.randn(n, 2), jnp.float32), axis=-1)

    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    vw = jnp.tile(jnp.array([[0.3, 0.0, 0.95]]) / np.linalg.norm([0.3, 0.0, 0.95]), (n, 1))
    alb = jnp.full((n, 3), 0.5)

    spec_b = (spec_k[None] * w[..., None]).sum(-2)   # [n,3]
    rough_b = (rough_k[None] * w[..., None]).sum(-2)  # [n,1]

    for fn, fallback in (
        (pt.pt_render_diff_shadow_indirect_blend, True),
        (pt.pt_render_diff_shadow2_indirect_blend, False),
    ):
        got = fn(key, _light(), spec_k, rough_k, alb, nrm, vw, pts, scene,
                 blending_weights=w)
        want = pt.pt_render_core(
            key, _light(), spec_b, rough_b, alb, nrm, vw, pts, scene,
            strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
            diff_geo=True, sphere_fallback=fallback,
        )
        for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), atol=1e-6,
                err_msg=f"{fn.__name__}/{k}")

    # the two blend variants must differ only via the sphere fallback's
    # effect on soft visibility at miss rays — i.e. they produce different
    # outputs on this occluded scene (guards against the flag being dead)
    a = pt.pt_render_diff_shadow_indirect_blend(
        key, _light(), spec_k, rough_k, alb, nrm, vw, pts, scene,
        blending_weights=w)
    b = pt.pt_render_diff_shadow2_indirect_blend(
        key, _light(), spec_k, rough_k, alb, nrm, vw, pts, scene,
        blending_weights=w)
    assert not np.allclose(np.asarray(a["sg_rgb"]), np.asarray(b["sg_rgb"]))


def test_indirect_compaction_exact_and_counts_overflow():
    """Hit-compacted vis/indirect (indirect_fraction < 1, non-diff_geo):
    sampling happens at full N BEFORE the compaction, so with the budget
    covering the per-strategy hit count every output is BIT-identical to the
    dense run and indirect_overflow is 0; with a starved budget the overflow
    counter reports exactly the dropped hits and only indirect-lit pixels
    change."""
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 512
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    key = jax.random.PRNGKey(5)
    args = (
        _light(), jnp.full((1, 3), 0.04), jnp.full((n, 1), 0.5),
        jnp.full((n, 3), 0.5), nrm, nrm, pts, scene,
    )
    kw = dict(strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
              diff_geo=False)

    dense = pt.pt_render_core(key, *args, **kw)
    hits = np.asarray(dense["secondary_mask"])[..., 0].sum(1)  # per strategy
    assert hits.max() > 0
    frac_ok = (hits.max() + 16) / n

    compact = pt.pt_render_core(key, *args, indirect_fraction=float(frac_ok), **kw)
    assert int(compact["n_indirect_overflow"]) == 0
    for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
        np.testing.assert_array_equal(
            np.asarray(dense[k]), np.asarray(compact[k]), err_msg=k)

    starved = pt.pt_render_core(key, *args, indirect_fraction=128.0 / n, **kw)
    expect_drop = int(np.maximum(hits - 128, 0).sum())
    assert expect_drop > 0
    assert int(starved["n_indirect_overflow"]) == expect_drop

    # diff_geo soft visibility needs the SDF at every ray: stays dense
    diffgeo = pt.pt_render_core(
        key, *args, indirect_fraction=0.25,
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect", diff_geo=True)
    assert int(diffgeo["n_indirect_overflow"]) == 0


def test_horizon_cull_exact_and_counts_overflow():
    """Horizon-culled secondary trace (secondary_fraction < 1, eval only):
    every strategy's contribution carries clip(wi.n, 0), so rays with
    wi.n <= 0 contribute exactly 0 — with the budget covering the
    above-horizon count the rgb outputs are BIT-identical to the dense
    trace and cull_overflow is 0; a starved budget reports exactly the
    untraced above-horizon rays; training keeps the dense trace."""
    sdf_fn = lambda x: jnp.linalg.norm(x, axis=-1) - 0.3
    scene = _mock_scene(sdf_fn)
    n = 512
    pts = jnp.tile(jnp.array([[0.0, 0.0, -0.6]]), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    key = jax.random.PRNGKey(7)
    args = (
        _light(), jnp.full((1, 3), 0.04), jnp.full((n, 1), 0.5),
        jnp.full((n, 3), 0.5), nrm, nrm, pts, scene,
    )
    kw = dict(strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
              diff_geo=False)

    dense = pt.pt_render_core(key, *args, **kw)
    wdn = np.asarray(dense["secondary_dir"]) @ np.array([0.0, 0.0, 1.0])
    n_above = int((wdn > 0).sum())
    assert n_above < 3 * n  # brdf/mix_sg sample some below-horizon dirs

    frac_ok = (n_above + 16) / (3 * n)
    culled = pt.pt_render_core(key, *args, secondary_fraction=frac_ok, **kw)
    assert int(culled["n_cull_overflow"]) == 0
    for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
        np.testing.assert_array_equal(
            np.asarray(dense[k]), np.asarray(culled[k]), err_msg=k)

    budget = max(128, (n_above - 100))
    starved = pt.pt_render_core(
        key, *args, secondary_fraction=budget / (3 * n), **kw)
    # +-1: the engine rounds the fraction to its own integer budget
    assert abs(int(starved["n_cull_overflow"]) - (n_above - budget)) <= 1

    # training renders keep the dense trace (distillation buffers intact)
    trained = pt.pt_render_core(
        key, *args, secondary_fraction=0.25, training=True, **kw)
    assert int(trained["n_cull_overflow"]) == 0
    np.testing.assert_array_equal(
        np.asarray(trained["secondary_mask"]),
        np.asarray(pt.pt_render_core(key, *args, training=True,
                                     **kw)["secondary_mask"]))
