"""Step-1 geometry training on a native-sampled sphere mesh."""

import os

import jax
import numpy as np
import pytest

from nefii_tpu.config import parse_string
from nefii_tpu.datasets.sdf_dataset import SDFDataset, SDFSampler
from nefii_tpu.training.geometry_trainer import GeometryTrainRunner
from nefii_tpu.utils.mesh_io import load_mesh, save_mesh

from test_native import _icosphere

GEOM_CONF = """
train{
    expname = geo_test
    model_class = model.implicit_differentiable_renderer.IDRNetwork
    plot_freq = 100000
    val_freq = 100000
    ckpt_freq = 200
    idr_learning_rate = 1e-3
    idr_sched_milestones = [400]
    idr_sched_factor = 0.5
}
model{
    feature_vector_size = 64
    implicit_network
    {
        d_in = 3
        d_out = 1
        dims = [ 64, 64, 64 ]
        geometric_init = True
        bias = 0.6
        skip_in = [2]
        weight_norm = True
        multires = 4
        use_last_as_f = True
    }
    envmap_material_network { multires = 2\n dims = [32]\n num_lgt_sgs = 4\n num_base_materials = 1 }
    rendering_network
    {
        mode = idr
        d_in = 9
        d_out = 3
        dims = [ 32 ]
        weight_norm = True
        multires_view = 2
        normalize_output = True
    }
    ray_tracer
    {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
        line_search_step = 0.5
        line_step_iters = 1
        sphere_tracing_iters = 5
        n_steps = 16
        n_rootfind_steps = 8
    }
}
"""


@pytest.fixture(scope="module")
def mesh_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh")
    v, f = _icosphere(2, r=0.5)
    path = str(d / "sphere.ply")
    save_mesh(path, v, f)
    return path


def test_mesh_io_roundtrip(tmp_path, mesh_file):
    v, f = load_mesh(mesh_file)
    v2_path = str(tmp_path / "copy.obj")
    save_mesh(v2_path, v, f)
    v2, f2 = load_mesh(v2_path)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_sdf_sampler_distribution(mesh_file):
    s = SDFSampler(mesh_file, number_of_points=10000, seed=1)
    pts, sdf = s.sample()
    assert pts.shape == (10000, 3)
    assert sdf.shape == (10000, 1)
    # most points near the (rescaled) surface
    # mesh scaled to unit sphere: radius 0.5 -> 1.0 then scaled back by 0.5
    frac_near = (np.abs(sdf) < 0.05).mean()
    assert frac_near > 0.8
    # sdf signs: interior points negative (all samples live inside the
    # scaled unit sphere, i.e. r <= 0.5 for this mesh — same as mesh_to_sdf)
    r = np.linalg.norm(pts, axis=1)
    inside = r < 0.45
    assert inside.sum() > 100
    assert (sdf[inside, 0] < 0).mean() > 0.99


def test_geometry_step_sharded_equals_single(mesh_file, tmp_path):
    """8-device sharded Step-1 grads/params == single-device (VERDICT r1 #5)."""
    import jax.numpy as jnp

    runners = []
    for n_dev in (1, 8):
        runners.append(
            GeometryTrainRunner(
                conf=parse_string(GEOM_CONF),
                mesh_path=mesh_file,
                batch_points=512,
                max_niters=10,
                exps_folder_name=str(tmp_path / f"exps{n_dev}"),
                n_devices=n_dev,
                seed=7,
            )
        )
    r1, r8 = runners
    assert r8.mesh.devices.size == 8

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    sdf_gt = rng.uniform(-0.2, 0.2, (512, 1)).astype(np.float32)
    losses = []
    for r in (r1, r8):
        for _ in range(3):
            r.params, r.opt_state, loss = r._step(
                r.params, r.opt_state, jnp.asarray(pts), jnp.asarray(sdf_gt)
            )
        losses.append(float(loss))
    l1, l8 = losses
    np.testing.assert_allclose(l8, l1, rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(r1.params["implicit_network"])
    p8 = jax.tree_util.tree_leaves(r8.params["implicit_network"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_geometry_training_converges(mesh_file, tmp_path):
    runner = GeometryTrainRunner(
        conf=parse_string(GEOM_CONF),
        mesh_path=mesh_file,
        batch_points=2048,
        max_niters=300,
        exps_folder_name=str(tmp_path / "exps"),
        log_freq=100,
    )
    runner.run(n_iters=300)

    # trained SDF approximates the sphere
    imp = runner.model.implicit_network
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    for r, tol in [(0.3, 0.1), (0.5, 0.05), (0.8, 0.15)]:
        sdf = np.asarray(imp.sdf(runner.params["implicit_network"], jnp.asarray(pts * r)))
        np.testing.assert_allclose(sdf.mean(), r - 0.5, atol=tol)

    # checkpoints exist
    assert os.path.exists(
        os.path.join(runner.checkpoints_path, "ModelParameters", "latest.npz")
    )
