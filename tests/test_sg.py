"""SG math tests: hemisphere integral vs Monte-Carlo quadrature, lambda trick,
and full closed-form shading sanity (energy conservation-ish checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.ops import sg

import pytest

pytestmark = pytest.mark.fast  # sub-minute math/unit tests


def _mc_hemisphere_int(lam, cos_beta, n=400_000, seed=0):
    """Monte-Carlo integral of exp(lam*(<w, xi>-1)) over hemisphere about n_hat,
    where <xi, n_hat> = cos_beta."""
    rng = np.random.RandomState(seed)
    # sample uniform directions on the sphere, keep hemisphere about n_hat=z
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v[v[:, 2] > 0]
    # SG axis xi at angle beta from z in the xz plane
    sin_beta = np.sqrt(max(0.0, 1 - cos_beta**2))
    xi = np.array([sin_beta, 0.0, cos_beta])
    vals = np.exp(lam * (v @ xi - 1.0))
    return vals.mean() * 2 * np.pi  # hemisphere area


def test_hemisphere_int_vs_quadrature():
    for lam in [1.0, 5.0, 30.0, 100.0]:
        for cos_beta in [-0.7, -0.2, 0.0, 0.3, 0.9, 1.0]:
            ref = _mc_hemisphere_int(lam, cos_beta)
            got = float(sg.hemisphere_int(jnp.array([lam]), jnp.array([cos_beta]))[0])
            assert abs(got - ref) <= max(0.08 * abs(ref), 5e-3), (lam, cos_beta, got, ref)


def test_lambda_trick_product_accuracy():
    # SG product approx: evaluate both sides at random directions
    rng = np.random.RandomState(0)
    lobe1 = np.array([0.0, 0.0, 1.0])
    lobe2 = np.array([np.sin(0.3), 0.0, np.cos(0.3)])
    lam1, lam2 = 5.0, 80.0
    mu1, mu2 = 2.0, 3.0

    l3, lam3, mu3 = sg.lambda_trick(
        jnp.asarray(lobe1), jnp.array([lam1]), jnp.array([mu1]),
        jnp.asarray(lobe2), jnp.array([lam2]), jnp.array([mu2]),
    )
    dirs = rng.randn(2000, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lhs = mu1 * np.exp(lam1 * (dirs @ lobe1 - 1)) * mu2 * np.exp(lam2 * (dirs @ lobe2 - 1))
    l3n = np.asarray(l3) / np.linalg.norm(np.asarray(l3))
    rhs = float(mu3[0]) * np.exp(float(lam3[0]) * (dirs @ l3n - 1))
    # compare where the product is non-negligible
    m = lhs > lhs.max() * 1e-3
    np.testing.assert_allclose(rhs[m], lhs[m], rtol=0.2)


def test_sg_fn():
    up = jnp.array([[0.0, 0.0, 1.0]])
    xi = jnp.array([[0.0, 0.0, 1.0]])
    val = sg.sg_fn(up, xi, jnp.array([[10.0]]), jnp.array([[2.0, 2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(val), 2.0, atol=1e-6)


def test_render_with_sg_shapes_and_positivity():
    key = jax.random.PRNGKey(0)
    M, K, N = 16, 1, 64
    lgt = jax.random.normal(key, (M, 7))
    lgt = lgt.at[:, 3].set(30.0 + jnp.abs(lgt[:, 3]))
    spec = jnp.full((K, 3), 0.04)
    rough = jnp.full((K, 1), 0.5)
    albedo = jax.random.uniform(key, (N, 3))
    normal = sg.norm_axis(jax.random.normal(jax.random.PRNGKey(1), (N, 3)))
    view = sg.norm_axis(normal + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (N, 3)))
    out = sg.render_with_sg(lgt, spec, rough, albedo, normal, view)
    for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
        assert out[k].shape == (N, 3)
        assert float(jnp.min(out[k])) >= 0.0
        assert bool(jnp.all(jnp.isfinite(out[k])))


def test_render_with_sg_diffuse_vs_quadrature():
    """Pure-diffuse closed-form SG render vs brute-force MC of the rendering
    equation for a single light SG."""
    lgt = jnp.array([[0.0, 0.0, 1.0, 8.0, 2.0, 2.0, 2.0]])  # lobe +z
    spec = jnp.zeros((1, 3))
    rough = jnp.full((1, 1), 0.9)
    albedo = jnp.full((1, 3), 0.7)
    normal = jnp.array([[0.0, 0.0, 1.0]])
    view = jnp.array([[0.0, 0.0, 1.0]])
    out = sg.render_with_sg(lgt, spec, rough, albedo, normal, view)

    # MC: integral albedo/pi * L(w) * <n,w> over hemisphere
    rng = np.random.RandomState(0)
    v = rng.randn(500_000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v[v[:, 2] > 0]
    L = 2.0 * np.exp(8.0 * (v[:, 2] - 1.0))
    integrand = 0.7 / np.pi * L * v[:, 2]
    ref = integrand.mean() * 2 * np.pi
    got = float(out["sg_diffuse_rgb"][0, 0])
    assert abs(got - ref) < 0.05 * ref, (got, ref)


def test_compute_envmap_conventions():
    lgt = jnp.array([[0.0, 1.0, 0.0, 40.0, 5.0, 5.0, 5.0]])  # lobe +y
    env = sg.compute_envmap(lgt, 32, 64, coordinate_type="mitsuba")
    assert env.shape == (32, 64, 3)
    # mitsuba: +y is phi=0 (top row) -> brightest at top
    top = float(env[0].max())
    bottom = float(env[-1].max())
    assert top > bottom

    env_b = sg.compute_envmap(
        jnp.array([[0.0, 0.0, 1.0, 40.0, 5.0, 5.0, 5.0]]), 32, 64, coordinate_type="blender"
    )
    assert float(env_b[0].max()) > float(env_b[-1].max())
