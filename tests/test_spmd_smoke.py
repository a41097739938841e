"""FAST-tier multichip smoke test (VERDICT r1 #7): a tiny sharded train step
on the 8-device CPU mesh must equal single-device, so sharding regressions
are caught by the default (non-slow) test run. The thorough SPMD equality
suite lives in test_spmd.py (slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefii_tpu.config import parse_string
from nefii_tpu.models.idr import IDRNetwork
from nefii_tpu.models.loss import IDRLoss
from nefii_tpu.parallel import spmd
from nefii_tpu.parallel.mesh import make_mesh

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"),
    pytest.mark.fast,  # the fast tier's sharding smoke (~75 s, its slowest item)
]

# render_type=sg: deterministic closed-form shading, so the sharded loss must
# EQUAL single-device (pt_render_* folds the RNG key per shard by design —
# per-rank sample streams, like the reference's DDP — and is covered by the
# slow suite's test_spmd.py)
MICRO_CONF = """
model{
    render_type = sg
    feature_vector_size = 16
    render_background = True
    implicit_network {
        d_in = 3
        d_out = 1
        dims = [ 16, 16 ]
        geometric_init = True
        bias = 0.6
        skip_in = [1]
        weight_norm = True
        multires = 2
        use_last_as_f = True
    }
    envmap_material_network {
        multires = 2
        dims = [ 16 ]
        num_lgt_sgs = 4
        num_base_materials = 1
        fix_specular_albedo = False
        specular_albedo = [0.5, 0.5, 0.5]
        roughness_mlp = False
        specular_mlp = False
        same_mlp = False
    }
    rendering_network {
        mode = idr
        d_in = 9
        d_out = 3
        dims = [ 16 ]
        weight_norm = True
        multires_view = 2
        multires_xyz = 2
        normalize_output = False
        clip_output = True
        clip_method = pow2
        weight_init = True
    }
    ray_tracer {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
        line_search_step = 0.5
        line_step_iters = 1
        sphere_tracing_iters = 3
        n_steps = 8
        n_rootfind_steps = 3
        sampler_budget = 8
        minsdf_budget = 8
    }
}
"""


def test_multichip_step_smoke():
    model = IDRNetwork.from_conf(parse_string(MICRO_CONF).get_config("model"))
    params = model.init_params(jax.random.PRNGKey(0))
    # eikonal_weight=0: its random points are sampled per-shard (key fold),
    # so it is the one loss term that is not shard-count invariant
    loss = IDRLoss(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.0,
        mask_weight=100.0, alpha=50.0, loss_type="L1", env_loss_type="L2",
        background_rgb_weight=1.0,
    )

    S = 16
    W = 32
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = W * 1.2
    K[0, 2] = K[1, 2] = W / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    rng = np.random.RandomState(0)
    batch = {
        "uv": jnp.asarray(rng.uniform(W * 0.3, W * 0.7, (1, S, 2)), jnp.float32),
        "object_mask": jnp.ones((1, S), bool),
        "intrinsics": jnp.asarray(K[None]),
        "pose": jnp.asarray(pose[None]),
    }
    gt = {"rgb": jnp.asarray(rng.rand(1, S, 3), jnp.float32)}
    key = jax.random.PRNGKey(2)
    alpha = jnp.float32(50.0)

    results = {}
    for n in (8, 1):
        mesh = make_mesh(n)
        fn = spmd.make_grad_fn(model, loss, mesh)(batch, gt)
        with mesh:
            ld, grads, _ = jax.jit(fn)(params, batch, gt, key, alpha)
            results[n] = (float(ld["loss"]), jax.tree_util.tree_leaves(grads))

    l8, g8 = results[8]
    l1, g1 = results[1]
    assert np.isfinite(l8)
    np.testing.assert_allclose(l8, l1, rtol=2e-4, atol=1e-6)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)
