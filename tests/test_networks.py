"""Network unit tests: shapes, init statistics, gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.embedder import get_embedder
from nefii_tpu.models.implicit import ImplicitNetwork
from nefii_tpu.models.material import EnvmapMaterialNetwork, compute_energy
from nefii_tpu.models.rendering import RenderingNetwork


def test_embedder_layout():
    embed, out_dim = get_embedder(4)
    assert out_dim == 3 + 3 * 2 * 4
    x = jnp.array([[0.1, -0.2, 0.3]])
    y = embed(x)
    assert y.shape == (1, out_dim)
    np.testing.assert_allclose(np.asarray(y[0, :3]), [0.1, -0.2, 0.3], atol=1e-7)
    # frequency bands 2^0..2^3, sin then cos per band
    np.testing.assert_allclose(np.asarray(y[0, 3:6]), np.sin([0.1, -0.2, 0.3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, 6:9]), np.cos([0.1, -0.2, 0.3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, 9:12]), np.sin([0.2, -0.4, 0.6]), atol=1e-6)


def _nefii_implicit():
    return ImplicitNetwork(
        feature_vector_size=512,
        d_in=3,
        d_out=1,
        dims=(512,) * 8,
        geometric_init=True,
        bias=0.6,
        skip_in=(4,),
        weight_norm=True,
        multires=6,
        use_last_as_f=True,
    )


def test_implicit_network_shapes_and_geometric_init():
    net = _nefii_implicit()
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (128, 3))
    out = net(params, pts)
    assert out.shape == (128, 1 + 512)

    # geometric init => sdf approx ||x|| - bias for points on a sphere
    sphere_pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True) * 1.0
    sdf = net.sdf(params, sphere_pts)
    # should be positive outside radius 0.6 and near 1 - 0.6 = 0.4ish
    assert float(jnp.mean(sdf)) > 0.0
    inner = sphere_pts * 0.1
    assert float(jnp.mean(net.sdf(params, inner))) < float(jnp.mean(sdf))


def test_implicit_gradient_matches_finite_difference():
    net = _nefii_implicit()
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 3)) * 0.5
    g = net.gradient(params, pts)
    assert g.shape == (8, 3)
    eps = 1e-3
    for axis in range(3):
        dp = jnp.zeros((8, 3)).at[:, axis].set(eps)
        fd = (net.sdf(params, pts + dp) - net.sdf(params, pts - dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, axis]), np.asarray(fd), atol=2e-2, rtol=1e-2)


def test_implicit_gradient_near_unit_norm_at_init():
    # geometric init should give an approximately eikonal field
    net = _nefii_implicit()
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(3), (256, 3)) * 0.5
    g = net.gradient(params, pts)
    norms = jnp.linalg.norm(g, axis=-1)
    assert 0.5 < float(jnp.mean(norms)) < 2.0


def test_rendering_network_pow2_output():
    net = RenderingNetwork(
        feature_vector_size=512,
        mode="idr",
        d_in=9,
        d_out=3,
        dims=(512,) * 4,
        weight_norm=True,
        weight_init=True,
        multires_view=4,
        multires_xyz=10,
        normalize_output=False,
        clip_output=True,
        clip_method="pow2",
    )
    params = net.init_params(jax.random.PRNGKey(0))
    n = 64
    key = jax.random.PRNGKey(1)
    pts, nrm, vd, feat = (
        jax.random.normal(key, (n, 3)),
        jax.random.normal(key, (n, 3)),
        jax.random.normal(key, (n, 3)),
        jax.random.normal(key, (n, 512)),
    )
    rgb = net(params, pts, nrm, vd, feat)
    assert rgb.shape == (n, 3)
    assert float(jnp.min(rgb)) >= 0.0  # pow2 clip


def _nefii_material():
    return EnvmapMaterialNetwork(
        multires=10,
        dims=(512,) * 8,
        white_specular=True,
        white_light=False,
        num_lgt_sgs=128,
        num_base_materials=1,
        upper_hemi=False,
        fix_specular_albedo=True,
        specular_albedo=(0.5, 0.5, 0.5),
        init_specular_reflectance=0.1,
        roughness_mlp=True,
        specular_mlp=True,
        dims_roughness=(512,) * 4,
        dims_specular=(512,) * 4,
        same_mlp=True,
        feature_vector_size=512,
    )


def test_material_network_outputs():
    net = _nefii_material()
    params = net.init_params(jax.random.PRNGKey(0))
    assert params["lgtSGs"].shape == (128, 7)

    # init light energy normalised to ~4pi over RGB sum of 2pi*2 design
    energy = compute_energy(params["lgtSGs"])
    total = jnp.sum(energy, axis=0)
    np.testing.assert_allclose(np.asarray(total), 2 * np.pi * np.ones(3), rtol=1e-4)

    # lobes unit-norm on the sphere (fibonacci init)
    lobe_norms = jnp.linalg.norm(params["lgtSGs"][:, :3], axis=-1)
    np.testing.assert_allclose(np.asarray(lobe_norms), np.ones(128), atol=1e-5)

    n = 32
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.5
    feat = jax.random.normal(jax.random.PRNGKey(2), (n, 512))
    out = net(params, pts, feat)
    assert out["sg_diffuse_albedo"].shape == (n, 3)
    assert out["sg_roughness"].shape == (n, 1)
    # roughness floor
    assert float(jnp.min(out["sg_roughness"])) >= 0.089 - 1e-6
    # fixed specular 0.5 with Filament remap -> 0.04
    np.testing.assert_allclose(np.asarray(out["sg_specular_reflectance"]), 0.04, atol=1e-6)
    assert out["sg_blending_weights"] is None

    # fake warmup switches; Filament remap applies after the fake override,
    # so fake specular 0.5 -> 0.16 * 0.5^2 = 0.04 (sg_envmap_material.py:407-414)
    out2 = net(params, pts, feat, fake_roughness=True, fake_specular=True)
    np.testing.assert_allclose(np.asarray(out2["sg_roughness"]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2["sg_specular_reflectance"]), 0.04, atol=1e-6)


def test_material_blending_weights_k2():
    net = EnvmapMaterialNetwork(
        multires=4,
        dims=(64, 64),
        num_lgt_sgs=16,
        num_base_materials=2,
        feature_vector_size=0,
    )
    params = net.init_params(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    out = net(params, pts)
    bw = out["sg_blending_weights"]
    assert bw.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(bw.sum(-1)), np.ones(10), atol=1e-5)
    assert out["sg_roughness"].shape == (2, 1)
    assert out["sg_specular_reflectance"].shape == (2, 3)
