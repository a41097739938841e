"""Trainer integration tests on a tiny synthetic scene."""

import os

import numpy as np
import pytest

from nefii_tpu.config import parse_string
from nefii_tpu.training.trainer import IDRTrainRunner

pytestmark = pytest.mark.slow  # integration tests: minutes on CPU

TRAIN_CONF = """
train{
    expname = test_scene
    dataset_class = datasets.scene_dataset.SceneDataset
    model_class = model.implicit_differentiable_renderer.IDRNetwork
    loss_class = model.loss.IDRLoss
    plot_freq = -1
    val_freq = -1
    ckpt_freq = 4
    num_pixels = 64
    num_rays = -1
    alpha_milestones = [4]
    alpha_factor = 2
    idr_learning_rate = 5e-4
    idr_sched_milestones = [6]
    idr_sched_factor = 0.5
    sg_learning_rate = 5e-4
    sg_sched_milestones = [6]
    sg_sched_factor = 0.5
}
plot{ plot_nimgs = 1 }
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
    feature_vector_size = 32
    fast_multi_ray = False
    render_background = True
    implicit_network
    {
        d_in = 3
        d_out = 1
        dims = [ 32, 32, 32 ]
        geometric_init = True
        bias = 0.5
        skip_in = [2]
        weight_norm = True
        multires = 2
        use_last_as_f = True
    }
    envmap_material_network
    {
        multires = 2
        dims = [ 32, 32 ]
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
        dims = [ 32, 32 ]
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
        sphere_tracing_iters = 5
        n_steps = 24
        n_rootfind_steps = 8
    }
}
"""


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Tiny 16x16 scene: lambertian sphere of radius 0.5, cameras on a ring."""
    from scene_factory import make_sphere_scene

    return make_sphere_scene(tmp_path_factory.mktemp("sphere_scene"))


def _make_runner(scene_dir, tmp_path, **kw):
    conf = parse_string(TRAIN_CONF)
    defaults = dict(
        conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps"),
        nepochs=1, max_niters=100, secondary_train_interval=4,
        secondary_batch_size=8, memory_capacity_level=12,
    )
    defaults.update(kw)
    return IDRTrainRunner(**defaults)


def test_train_smoke_and_checkpoint_resume(scene_dir, tmp_path):
    runner = _make_runner(scene_dir, tmp_path)
    runner.run()  # 1 epoch = 3 iterations
    assert runner.cur_iter >= 3

    # checkpoints written (five collections + latest)
    ckdir = runner.checkpoints_path
    for coll in ("ModelParameters", "IDROptimizerParameters", "SGOptimizerParameters",
                 "IDRSchedulerParameters", "SGSchedulerParameters"):
        assert os.path.exists(os.path.join(ckdir, coll, "latest.npz")), coll

    # resume restores params identically
    runner2 = _make_runner(
        scene_dir, tmp_path, is_continue=True, timestamp=runner.timestamp,
        expname="test_scene",
    )
    import jax

    a = jax.tree_util.tree_leaves(runner.params)
    b = jax.tree_util.tree_leaves(runner2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # the exact checkpointed iteration is restored, not recomputed from the
    # epoch (which would inflate it by ~batch_size for batch_size > 1)
    assert runner2.cur_iter == runner.cur_iter

    runner3 = _make_runner(
        scene_dir, tmp_path, is_continue=True, timestamp=runner.timestamp,
        expname="test_scene", batch_size=2,
    )
    assert runner3.cur_iter == runner.cur_iter


def test_batch_size_two_trains_on_both_images(scene_dir, tmp_path):
    """--batch_size stacks B images per step and both contribute to the loss
    (reference DataLoader semantics, idr_train.py:152-160)."""
    import jax
    import jax.numpy as jnp

    runner = _make_runner(
        scene_dir, tmp_path, batch_size=2, nepochs=1, max_niters=10,
        secondary_train_interval=-1,
    )

    seen_B = []
    orig_collate = runner.train_dataset.collate

    def recording_collate(items):
        idxs, s, g = orig_collate(items)
        seen_B.append(s["uv"].shape[0])
        return idxs, s, g

    runner.train_dataset.collate = recording_collate
    runner.run()
    # ceil(3/2) = 2 steps per epoch: one full batch of 2, then the 1-image
    # remainder (reference loader has no drop_last, idr_train.py:152-160);
    # nepochs=1 runs epochs 0 and 1
    assert seen_B == [2, 1, 2, 1], seen_B

    # both rows contribute: perturbing image 2's gt changes the loss
    runner._sample_pixels(0)
    indices, model_input, ground_truth = orig_collate(
        [runner.train_dataset[0], runner.train_dataset[1]]
    )
    batch, gt = runner._device_batch(model_input, ground_truth, indices)
    step = runner._get_step(False, False, batch, gt)
    key = jax.random.PRNGKey(3)
    alpha = jnp.float32(50.0)
    def fresh_args():  # the jitted step donates these buffers
        return jax.tree_util.tree_map(
            jnp.copy, (runner.params, runner.idr_opt_state, runner.sg_opt_state)
        )

    *_, ld_a, _ = step(*fresh_args(), batch, gt, key, alpha)
    gt_b = {"rgb": gt["rgb"].at[1].set(0.0)}
    *_, ld_b, _ = step(*fresh_args(), batch, gt_b, key, alpha)
    assert float(ld_a["loss"]) != float(ld_b["loss"])


def test_train_loss_decreases(scene_dir, tmp_path):
    runner = _make_runner(scene_dir, tmp_path, nepochs=8, secondary_train_interval=-1)
    runner.log_freq = 1
    losses = []
    runner.log_scalars = lambda e, ld, f, a: losses.append(float(ld["loss"]))
    runner.run()
    assert len(losses) >= 8
    # optimisation makes progress on the tiny scene
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_freeze_geometry_keeps_implicit_params(scene_dir, tmp_path):
    runner = _make_runner(scene_dir, tmp_path, freeze_geometry=True)
    before = [np.asarray(l).copy() for l in
              __import__("jax").tree_util.tree_leaves(runner.params["implicit_network"])]
    runner.run()
    after = __import__("jax").tree_util.tree_leaves(runner.params["implicit_network"])
    for x, y in zip(before, after):
        np.testing.assert_array_equal(x, np.asarray(y))
    # material params did change
    mat_before = runner.model.init_params(__import__("jax").random.PRNGKey(0))
    # (just check lgtSGs moved from init since sg optimizer ran)
    assert not np.allclose(
        np.asarray(runner.params["envmap_material_network"]["lgtSGs"]),
        np.asarray(mat_before["envmap_material_network"]["lgtSGs"]),
    )


def _run_secondary_step(runner):
    import jax
    import jax.numpy as jnp

    step = runner._get_secondary_step(False, False)
    pts = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 3)) * 0.4
    dirs = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {"points": pts, "ray_dirs": dirs}
    valid = jnp.ones((8,), jnp.float32)

    before_p = jax.tree_util.tree_map(np.asarray, runner.params)
    params, idr_state, sg_state, l = step(
        runner.params, runner.idr_opt_state, runner.sg_opt_state,
        batch, valid, jax.random.PRNGKey(2),
    )
    after_p = jax.tree_util.tree_map(np.asarray, params)
    return before_p, after_p


def test_secondary_step_frozen_geometry_leaves_implicit_untouched(scene_dir, tmp_path):
    """With the run-level --freeze_geometry flag (the shipped Step-2
    workflow), implicit params have requires_grad=False in the reference and
    torch Adam skips them — the implicit net must be bit-identical before and
    after the secondary step, while material params move."""
    import jax

    runner = _make_runner(
        scene_dir, tmp_path, secondary_train_interval=-1, freeze_geometry=True
    )
    before_p, after_p = _run_secondary_step(runner)

    for a, b in zip(jax.tree_util.tree_leaves(before_p["implicit_network"]),
                    jax.tree_util.tree_leaves(after_p["implicit_network"])):
        np.testing.assert_array_equal(a, b)

    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(before_p["envmap_material_network"]),
            jax.tree_util.tree_leaves(after_p["envmap_material_network"]),
        )
    )
    assert moved


def test_secondary_step_unfrozen_geometry_trains_feature_path(scene_dir, tmp_path):
    """Without the freeze flag, the reference's secondary step keeps the
    feature path attached (implicit_differentiable_renderer.py:514-518,
    :533-540 detach only the normals) and its idr optimizer steps the
    implicit net — ours must too."""
    import jax

    runner = _make_runner(scene_dir, tmp_path, secondary_train_interval=-1)
    before_p, after_p = _run_secondary_step(runner)

    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(before_p["implicit_network"]),
            jax.tree_util.tree_leaves(after_p["implicit_network"]),
        )
    )
    assert moved
    for leaf in jax.tree_util.tree_leaves(after_p):
        assert np.all(np.isfinite(leaf))


def test_epoch_remainder_batch_trains(scene_dir, tmp_path):
    """The reference DataLoader has no drop_last (idr_train.py:152-160): with
    3 images and batch_size=2, an epoch is TWO steps (2 images + the 1-image
    remainder). Round-2 dropped the remainder; it must train now."""
    runner = _make_runner(
        scene_dir, tmp_path, batch_size=2, nepochs=1,
        secondary_train_interval=-1,
    )
    assert len(runner.train_dataset) == 3
    runner.run()
    # ceil(3/2) = 2 steps/epoch x 2 epochs (nepochs=1 runs epochs 0 and 1)
    assert runner.cur_iter == 4
