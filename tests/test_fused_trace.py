"""Fused whole-trace Pallas kernel vs the jnp sphere tracer (interpret mode).

The kernel (ops/pallas/fused_trace.py) must reproduce RayTracer._sphere_trace
exactly: same accumulated distances, same unfinished masks, same downstream
hit mask — the jnp implementation is the correctness oracle (the kernel is an
off-by-default perf knob, see the module docstring for measured numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefii_tpu.models.implicit import ImplicitNetwork
from nefii_tpu.ops.pallas.fused_trace import build_fused_sphere_trace
from nefii_tpu.ops.ray_tracing import RayTracer, TraceResult
from nefii_tpu.utils.camera import get_sphere_intersection


@pytest.fixture(scope="module")
def small_net():
    net = ImplicitNetwork(
        feature_vector_size=8,
        d_in=3,
        d_out=1,
        dims=[64, 64, 64, 64],
        geometric_init=True,
        bias=0.6,
        skip_in=[2],
        weight_norm=True,
        multires=6,
    )
    params = net.init_params(jax.random.PRNGKey(0))
    return net, params


def _rays(n=300, seed=1):
    cam_loc = jnp.array([[0.0, 0.0, 2.5]])
    targets = jax.random.normal(jax.random.PRNGKey(seed), (1, n, 3)) * 0.6
    dirs = targets - cam_loc[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return cam_loc, dirs


def test_fused_trace_matches_jnp_oracle(small_net):
    net, params = small_net
    tracer = RayTracer(
        sdf_threshold=5e-5, line_search_step=0.5, line_step_iters=3,
        sphere_tracing_iters=10,
    )
    cam_loc, dirs = _rays()
    B, S, _ = dirs.shape
    N = B * S
    cam = jnp.broadcast_to(cam_loc[:, None, :], (B, S, 3)).reshape(N, 3)
    d = dirs.reshape(N, 3)
    si, mi = get_sphere_intersection(cam_loc, dirs, r=tracer.object_bounding_sphere)
    near, far = si[..., 0].reshape(N), si[..., 1].reshape(N)
    mi = mi.reshape(N)
    assert 0 < int(mi.sum()) < N  # mix of hits and misses

    sdf_fn = lambda x: net.sdf(params, x)
    ref = tracer._sphere_trace(sdf_fn, cam, d, mi, near, far)
    fused = build_fused_sphere_trace(net, params, tracer, tile=128, interpret=True)
    out = fused(cam, d, mi, near, far)

    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=1e-5)
    # unfinished mask + min/max distances exact
    assert (np.asarray(out[2]).astype(bool) == np.asarray(ref[2])).all()
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(ref[3]))
    np.testing.assert_array_equal(np.asarray(out[4]), np.asarray(ref[4]))
    # downstream hit mask identical
    hit_ref = np.asarray(ref[0]) < np.asarray(ref[1])
    hit_out = np.asarray(out[0]) < np.asarray(out[1])
    np.testing.assert_array_equal(hit_out, hit_ref)
    # eval counter is a live traced count, not a constant
    assert int(out[5]) > 0


def test_fused_trace_through_ray_tracer_hook(small_net):
    """RayTracer(sphere_trace_fn=...) plugs the kernel into the full pipeline
    (fallback sampler + training extras still run on sdf_fn)."""
    net, params = small_net
    tracer = RayTracer(sphere_tracing_iters=10, line_step_iters=1)
    cam_loc, dirs = _rays(n=120, seed=3)
    obj_mask = jnp.ones((120,), bool)

    sdf_fn = lambda x: net.sdf(params, x)
    ref = tracer(sdf_fn, cam_loc, obj_mask, dirs, key=jax.random.PRNGKey(7),
                 training=True)
    fused = build_fused_sphere_trace(net, params, tracer, tile=64, interpret=True)
    out = tracer(sdf_fn, cam_loc, obj_mask, dirs, key=jax.random.PRNGKey(7),
                 training=True, sphere_trace_fn=fused)

    assert isinstance(out, TraceResult)
    np.testing.assert_array_equal(
        np.asarray(out.object_mask), np.asarray(ref.object_mask)
    )
    np.testing.assert_allclose(
        np.asarray(out.dists), np.asarray(ref.dists), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.points), np.asarray(ref.points), atol=1e-5
    )
