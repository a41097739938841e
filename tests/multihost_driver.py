"""Multi-process driver for test_multihost.py.

Each invocation is one process of a jax.distributed CPU cluster:
    python multihost_driver.py <process_id> <num_processes> <port> <devs_per_proc>

Builds the small IDR model on the GLOBAL mesh (all processes' devices),
runs one shard-mapped loss+grad evaluation on a deterministic synthetic
batch (every process constructs the same full batch and contributes its
addressable shards), and prints `RESULT {json}` with the loss and a grad
norm. test_multihost.py asserts the values equal the single-process run —
the reference's DDP-equals-serial guarantee (SURVEY.md §2.6) extended to
multi-host.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (_HERE, os.path.dirname(_HERE)):
    if _p not in sys.path:
        sys.path.insert(0, _p)


def build_case():
    """Deterministic model/batch shared by every process and the test."""
    import jax
    import numpy as np

    from nefii_tpu.config import parse_string
    from nefii_tpu.models.idr import IDRNetwork
    from nefii_tpu.models.loss import IDRLoss

    # deliberately tiny (16-wide nets, short trace loops, closed-form SG
    # shading): the test compiles this model in three separate processes.
    # The distributed surface under test — global batch placement, cross-
    # process psum of losses/grads, rank guards — is independent of the
    # render type; the MC path's sharded==single equality is covered by
    # test_spmd.py on a single-process mesh, and its compile cost here
    # (~7 min for 2-process CPU) would dominate the suite
    conf = """
    model{
        render_type = sg
        feature_vector_size = 16
        implicit_network
        {
            d_in = 3
            d_out = 1
            dims = [16, 16]
            geometric_init = True
            bias = 0.5
            skip_in = [1]
            weight_norm = True
            multires = 2
            use_last_as_f = True
        }
        envmap_material_network
        {
            multires = 2
            dims = [16]
            white_specular = True
            num_lgt_sgs = 4
            num_base_materials = 1
            fix_specular_albedo = True
            specular_albedo = [0.5, 0.5, 0.5]
            roughness_mlp = False
            specular_mlp = False
            same_mlp = False
        }
        rendering_network
        {
            mode = idr
            d_in = 9
            d_out = 3
            dims = [16]
            weight_norm = True
            multires_view = 2
            multires_xyz = 2
            normalize_output = False
            clip_output = True
            clip_method = pow2
            weight_init = True
        }
        ray_tracer
        {
            object_bounding_sphere = 1.0
            sdf_threshold = 5.0e-5
            line_search_step = 0.5
            line_step_iters = 1
            sphere_tracing_iters = 3
            n_steps = 12
            n_rootfind_steps = 4
        }
    }
    """
    model = IDRNetwork.from_conf(parse_string(conf).get_config("model"))
    loss = IDRLoss(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.1,
        mask_weight=100.0, alpha=50.0, r_patch=-1,
        background_rgb_weight=1.0,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    S = 32
    rng = np.random.RandomState(7)
    W = 64
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = W * 1.2
    K[0, 2] = K[1, 2] = W / 2.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.5]
    uv = rng.uniform(W * 0.25, W * 0.75, (1, S, 2)).astype(np.float32)
    batch = {
        "uv": uv,
        "object_mask": np.ones((1, S), bool),
        "intrinsics": K[None],
        "pose": pose[None],
    }
    gt = {"rgb": rng.uniform(0.0, 1.0, (1, S, 3)).astype(np.float32)}
    return model, loss, params, batch, gt


def evaluate(mesh):
    """One loss+grad evaluation on `mesh`; returns {loss, gnorm}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nefii_tpu.parallel import dist, spmd

    model, loss, params, batch, gt = build_case()
    grad_fn = spmd.make_grad_fn(model, loss, mesh)(batch, gt)
    batch_g = dist.make_global_batch(mesh, batch, spmd.batch_pspec(batch))
    gt_g = dist.make_global_batch(mesh, gt, spmd.batch_pspec(gt))
    with mesh:
        ld, grads, _ = grad_fn(
            params, batch_g, gt_g, jax.random.PRNGKey(1), jnp.float32(50.0)
        )
    loss_v = float(dist.to_host(ld["loss"]))
    gnorm = float(
        np.sqrt(
            sum(
                float((dist.to_host(g).astype(np.float64) ** 2).sum())
                for g in jax.tree_util.tree_leaves(grads)
            )
        )
    )
    return {"loss": loss_v, "gnorm": gnorm}


def check_rank0_host_paths(mesh):
    """Regression for the rank-0-only host paths (vis envmap/surface export,
    checkpoint writes): on params placed GLOBALLY (replicated but not fully
    addressable — what the trainer's params become after the first jitted
    step), `dist.local_replica` and the checkpoint flattener must read the
    local replica collective-free. A plain np.asarray there raises
    "not fully addressable", and any collective would deadlock the other
    ranks, which never enter the is_main() branch."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nefii_tpu.parallel import dist
    from nefii_tpu.utils import checkpoints as ckpt

    model, _, params, _, _ = build_case()
    # all processes place (device_put to a multi-host sharding is itself a
    # cooperative call); only rank 0 reads back
    gparams = jax.device_put(params, NamedSharding(mesh, P()))
    if not dist.is_main():
        return True
    ref = ckpt.flatten_tree(params)
    local = ckpt.flatten_tree(dist.local_replica(gparams))
    via_ckpt = ckpt.flatten_tree(gparams)
    return all(
        np.allclose(local[k], v) and np.allclose(via_ckpt[k], v)
        for k, v in ref.items()
    )


def main():
    pid, nproc, port, devs = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    )
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent executable cache: the 3 test processes (and repeat runs)
    # compile the same tiny program — share it instead of recompiling.
    # Per-machine dir: foreign entries stall Gloo init (VERDICT r4 #7)
    from nefii_tpu.utils import compile_cache

    compile_cache.setup(jax, min_compile_secs=1.0)

    from nefii_tpu.parallel import dist

    dist.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    from nefii_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == nproc * devs

    res = evaluate(mesh)
    res["is_main"] = bool(dist.is_main())
    res["process_count"] = jax.process_count()
    res["rank0_host_paths_ok"] = bool(check_rank0_host_paths(mesh))
    print("RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
