"""Sphere tracer tests against analytic SDFs with closed-form intersections."""

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.sample_network import sample_network
from nefii_tpu.ops.ray_tracing import RayTracer

import pytest

pytestmark = pytest.mark.fast  # sub-minute math/unit tests


def sphere_sdf(r=0.5):
    return lambda x: jnp.linalg.norm(x, axis=-1) - r


def box_sdf(half=0.4):
    def f(x):
        q = jnp.abs(x) - half
        outside = jnp.linalg.norm(jnp.clip(q, 0.0), axis=-1)
        inside = jnp.clip(jnp.max(q, axis=-1), None, 0.0)
        return outside + inside

    return f


def _camera_rays(n_side=8, eye=(0.0, 0.0, -3.0), spread=0.25):
    """Grid of rays from `eye` roughly toward the origin."""
    eye = np.array(eye, dtype=np.float32)
    xs = np.linspace(-spread, spread, n_side)
    ys = np.linspace(-spread, spread, n_side)
    dirs = []
    for y in ys:
        for x in xs:
            d = np.array([x, y, 0.0]) - eye
            dirs.append(d / np.linalg.norm(d))
    dirs = np.stack(dirs)[None]  # [1, S, 3]
    return jnp.asarray(eye[None]), jnp.asarray(dirs.astype(np.float32))


def _closed_form_sphere_hit(eye, dirs, r):
    """t for ray o + t d hitting |x| = r (np, per ray; nan if miss)."""
    o = np.asarray(eye)[0]
    d = np.asarray(dirs)[0]
    b = d @ o
    c = o @ o - r * r
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    t[disc <= 0] = np.nan
    return t


def test_trace_sphere_matches_closed_form():
    tracer = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=32)
    cam, dirs = _camera_rays(n_side=8, spread=0.6)
    S = dirs.shape[1]
    obj_mask = jnp.ones((S,), bool)
    res = tracer(sphere_sdf(0.5), cam, obj_mask, dirs)

    t_ref = _closed_form_sphere_hit(cam, dirs, 0.5)
    hit_ref = ~np.isnan(t_ref)
    hit = np.asarray(res.object_mask)
    # allow disagreement only for extreme grazing rays
    grazing = np.abs(np.nan_to_num(t_ref, nan=0.0)) * 0
    agree = hit == hit_ref
    assert agree.mean() > 0.95, f"hit mask agreement {agree.mean()}"
    m = hit & hit_ref
    np.testing.assert_allclose(np.asarray(res.dists)[m], t_ref[m], atol=2e-3)
    # surface points actually on the sphere
    pts = np.asarray(res.points)[m]
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 0.5, atol=2e-3)


def test_trace_sphere_secant_rootfind():
    """Secant option (reference ray_tracing.py:282-307) matches closed form."""
    tracer = RayTracer(
        sphere_tracing_iters=3, n_steps=100, n_rootfind_steps=16,
        rootfind_method="secant",
    )
    cam, dirs = _camera_rays(n_side=8, spread=0.6)
    S = dirs.shape[1]
    res = tracer(sphere_sdf(0.5), cam, jnp.ones((S,), bool), dirs)

    t_ref = _closed_form_sphere_hit(cam, dirs, 0.5)
    hit_ref = ~np.isnan(t_ref)
    hit = np.asarray(res.object_mask)
    both = hit & hit_ref
    assert both.sum() > 10
    np.testing.assert_allclose(
        np.asarray(res.dists)[both], t_ref[both], atol=5e-4
    )


def test_trace_box():
    tracer = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=32)
    cam, dirs = _camera_rays(n_side=6, spread=0.3)
    S = dirs.shape[1]
    res = tracer(box_sdf(0.4), cam, jnp.ones((S,), bool), dirs)
    hit = np.asarray(res.object_mask)
    assert hit.all()  # all rays point at the box face
    pts = np.asarray(res.points)[hit]
    # front face of the box is z = -0.4
    np.testing.assert_allclose(pts[:, 2], -0.4, atol=2e-3)


def test_trace_miss_rays():
    tracer = RayTracer()
    cam = jnp.array([[0.0, 0.0, -3.0]])
    dirs = jnp.array([[[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])  # miss, hit
    res = tracer(sphere_sdf(0.5), cam, jnp.ones((2,), bool), dirs)
    hit = np.asarray(res.object_mask)
    assert not hit[0] and hit[1]
    np.testing.assert_allclose(float(res.dists[1]), 2.5, atol=2e-3)


def test_trace_training_mode_minsdf_points():
    tracer = RayTracer()
    cam = jnp.array([[0.0, 0.0, -3.0]])
    # near-miss ray passing above the sphere, object_mask=True (mask conflict)
    d = np.array([0.0, 0.62, 3.0])
    d = d / np.linalg.norm(d)
    dirs = jnp.asarray(d, jnp.float32)[None, None]
    res = tracer(
        sphere_sdf(0.5), cam, jnp.ones((1,), bool), dirs,
        key=jax.random.PRNGKey(0), training=True,
    )
    assert not bool(res.object_mask[0])
    # min-sdf point should be near the closest approach to the sphere
    p = np.asarray(res.points[0])
    closest_t = -float(jnp.dot(dirs[0, 0], cam[0]))
    p_ref = np.asarray(cam[0] + closest_t * dirs[0, 0])
    assert np.linalg.norm(p - p_ref) < 0.1, (p, p_ref)


def test_trace_jit_and_budget_consistency():
    cam, dirs = _camera_rays(n_side=4, spread=0.8)  # some rays miss
    S = dirs.shape[1]
    obj = jnp.ones((S,), bool)

    dense = RayTracer()
    budget = RayTracer(sampler_budget=S, minsdf_budget=S)  # full budget == dense

    f_dense = jax.jit(lambda c, d: dense(sphere_sdf(0.5), c, obj, d))
    f_budget = jax.jit(lambda c, d: budget(sphere_sdf(0.5), c, obj, d))
    r1 = f_dense(cam, dirs)
    r2 = f_budget(cam, dirs)
    np.testing.assert_allclose(np.asarray(r1.dists), np.asarray(r2.dists), atol=1e-6)
    assert (np.asarray(r1.object_mask) == np.asarray(r2.object_mask)).all()

    # small budget: hits must still be identical for converged rays
    small = RayTracer(sampler_budget=4, minsdf_budget=4)
    r3 = jax.jit(lambda c, d: small(sphere_sdf(0.5), c, obj, d))(cam, dirs)
    conv = np.asarray(r1.object_mask)
    np.testing.assert_allclose(
        np.asarray(r3.dists)[conv], np.asarray(r1.dists)[conv], atol=1e-3
    )


def test_sample_network_gradient_implicit_function_theorem():
    """d(hit point)/d(radius) through sample_network == analytic value."""
    cam = jnp.array([0.0, 0.0, -3.0])
    v = jnp.array([0.0, 0.0, 1.0])

    def hit_point(r):
        sdf = lambda x: jnp.linalg.norm(x, axis=-1, keepdims=True) - r
        t0 = 3.0 - jax.lax.stop_gradient(r)  # traced dist (no grad, like the tracer)
        x0 = cam + t0 * v
        surface_output = sdf(x0[None])  # differentiable in r
        surface_sdf_det = jax.lax.stop_gradient(surface_output)
        grad = jax.lax.stop_gradient(x0 / jnp.linalg.norm(x0))[None]
        pt = sample_network(
            surface_output, surface_sdf_det, grad,
            jnp.array([[t0]]), cam[None], v[None],
        )
        return pt[0]

    jac = jax.jacobian(hit_point)(jnp.float32(0.5))
    # increasing r moves the hit point toward the camera: d x_z / d r = -1
    np.testing.assert_allclose(np.asarray(jac), [0.0, 0.0, -1.0], atol=1e-4)


def test_budget_overflow_counters():
    """Over-filled fallback budgets must report how many rays they dropped
    (the budgets' 'exact while under budget' claim must be observable)."""
    cam, dirs = _camera_rays(n_side=4, spread=0.8)  # mix of hit + miss rays
    S = dirs.shape[1]
    obj = jnp.ones((S,), bool)
    key = jax.random.PRNGKey(0)

    # dense tracer: exact, zero overflow on both counters
    r_dense = RayTracer()(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
    assert int(r_dense.sampler_overflow) == 0
    assert int(r_dense.minsdf_overflow) == 0

    # sphere_tracing_iters=0 leaves every sphere-intersecting ray unconverged
    # -> all take the fallback sampler; budget 2 < that count
    r_s = RayTracer(sphere_tracing_iters=0, sampler_budget=2)(
        sphere_sdf(0.5), cam, obj, dirs, key=key, training=True
    )
    n_unf = int(r_s.sampler_overflow)
    assert n_unf > 0

    # miss rays (inside the bounding sphere, object_mask on) take the min-SDF
    # path in training; budget 1 < their count
    r_m = RayTracer(minsdf_budget=1)(
        sphere_sdf(0.5), cam, obj, dirs, key=key, training=True
    )
    assert int(r_m.minsdf_overflow) > 0
    assert int(r_m.sampler_overflow) == 0

    # counters survive jit
    f = jax.jit(
        lambda c, d: RayTracer(minsdf_budget=1)(
            sphere_sdf(0.5), c, obj, d, key=key, training=True
        )
    )
    assert int(f(cam, dirs).minsdf_overflow) == int(r_m.minsdf_overflow)


def test_midtrace_compaction_exact_when_budget_fits():
    """With compact_budget >= the live count at compact_after, the two-phase
    trace must reproduce the dense trace exactly (same hits, same dists) and
    report zero trace_overflow."""
    cam, dirs = _camera_rays(n_side=8, spread=0.6)
    S = dirs.shape[1]
    obj = jnp.ones((S,), bool)
    key = jax.random.PRNGKey(0)

    dense = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=32)
    # sphere tracing converges linearly, so the live set around the tiny
    # threshold shrinks late: compact at iter 3 with a budget that only needs
    # a handful of rays to have converged by then
    comp = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=32,
                     compact_after=3, compact_budget=S - 8)

    for training in (False, True):
        r_d = dense(sphere_sdf(0.5), cam, obj, dirs, key=key, training=training)
        r_c = comp(sphere_sdf(0.5), cam, obj, dirs, key=key, training=training)
        assert int(r_c.trace_overflow) == 0
        np.testing.assert_array_equal(
            np.asarray(r_d.object_mask), np.asarray(r_c.object_mask))
        np.testing.assert_allclose(
            np.asarray(r_d.dists), np.asarray(r_c.dists), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(r_d.points), np.asarray(r_c.points), atol=1e-6)
        # phase-2 ran on the smaller array: strictly fewer SDF evals
        assert int(r_c.n_evals) < int(r_d.n_evals)

    # jit parity
    jit_c = jax.jit(
        lambda c, d: comp(sphere_sdf(0.5), c, obj, d, key=key, training=True)
    )(cam, dirs)
    r_c = comp(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
    np.testing.assert_allclose(
        np.asarray(jit_c.dists), np.asarray(r_c.dists), atol=1e-6)


def test_midtrace_compaction_overflow_counted():
    """A compact_budget smaller than the live count must report the shortfall
    in trace_overflow, and overflow rays still produce sane results (they
    fall through to the fallback sampler like never-converged rays)."""
    # slow-converging SDF: scale down the step so many rays stay live
    slow = lambda x: 0.12 * (jnp.linalg.norm(x, axis=-1) - 0.5)
    cam, dirs = _camera_rays(n_side=8, spread=0.6)
    S = dirs.shape[1]
    obj = jnp.ones((S,), bool)
    key = jax.random.PRNGKey(0)

    comp = RayTracer(sphere_tracing_iters=10, n_steps=100, n_rootfind_steps=32,
                     compact_after=1, compact_budget=2)
    r = comp(slow, cam, obj, dirs, key=key, training=True)
    assert int(r.trace_overflow) > 0
    assert np.isfinite(np.asarray(r.dists)).all()
    # sampler rescues overflow rays: hits still found on the sphere
    hit = np.asarray(r.object_mask)
    t_true = _closed_form_sphere_hit(cam, dirs, 0.5)
    got = np.asarray(r.dists)[hit]
    want = t_true[hit]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rootfind_compaction_exact_and_overflow_counted():
    """rootfind_budget compacts the sampler's root-find to the net_surface
    rays. The compacted subset contains every `work` ray driving the loop's
    any(work) condition, so iteration counts and per-ray updates match the
    dense run BIT-exactly while the budget covers the net_surface count;
    a starved budget reports the shortfall in rootfind_overflow."""
    cam, dirs = _camera_rays(n_side=8, spread=0.6)
    S = dirs.shape[1]
    obj = jnp.ones((S,), bool)
    key = jax.random.PRNGKey(0)

    for method in ("bisection", "secant"):
        # sphere_tracing_iters=0 -> every intersecting ray takes the sampler,
        # so the rootfind sees a realistic mixed batch of hits and misses
        dense = RayTracer(sphere_tracing_iters=0, n_steps=50,
                          n_rootfind_steps=16, rootfind_method=method)
        r_d = dense(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
        n_hits = int(np.asarray(r_d.object_mask).sum())
        assert 0 < n_hits < S

        comp = RayTracer(sphere_tracing_iters=0, n_steps=50,
                         n_rootfind_steps=16, rootfind_method=method,
                         rootfind_budget=n_hits + 4)
        r_c = comp(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
        assert int(r_c.rootfind_overflow) == 0
        np.testing.assert_array_equal(
            np.asarray(r_d.object_mask), np.asarray(r_c.object_mask))
        np.testing.assert_array_equal(
            np.asarray(r_d.dists), np.asarray(r_c.dists), err_msg=method)
        assert int(r_c.n_evals) < int(r_d.n_evals)

        starved = RayTracer(sphere_tracing_iters=0, n_steps=50,
                            n_rootfind_steps=16, rootfind_method=method,
                            rootfind_budget=2)
        r_s = starved(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
        assert int(r_s.rootfind_overflow) > 0
        assert np.isfinite(np.asarray(r_s.dists)).all()

    # composes with the sampler budget (rootfind inside the sampler subset;
    # method pinned to the loop's last iteration so r_d matches)
    both = RayTracer(sphere_tracing_iters=0, n_steps=50, n_rootfind_steps=16,
                     rootfind_method="secant",
                     sampler_budget=S, rootfind_budget=n_hits + 4)
    r_b = both(sphere_sdf(0.5), cam, obj, dirs, key=key, training=True)
    assert int(r_b.rootfind_overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(r_b.dists), np.asarray(r_d.dists))
