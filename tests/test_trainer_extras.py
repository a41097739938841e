"""Trainer extras: camera-pose optimisation and the view-diff pairing loop."""

import numpy as np
import pytest

from nefii_tpu.config import parse_string
from nefii_tpu.training.trainer import IDRTrainRunner

from test_trainer import TRAIN_CONF, scene_dir  # noqa: F401

pytestmark = pytest.mark.slow  # integration tests: minutes on CPU


def test_train_cameras_updates_poses(scene_dir, tmp_path):
    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF), data_split_dir=scene_dir,
        data_split_dir_test=scene_dir, gamma=1.0,
        exps_folder_name=str(tmp_path / "exps"), nepochs=1, max_niters=10,
        secondary_train_interval=-1, memory_capacity_level=12,
        train_cameras=True,
    )
    conf = parse_string(TRAIN_CONF)
    # learning_rate_cam not in the tiny conf: patch it in
    runner.conf.put("train.learning_rate_cam", 1e-3)
    import optax

    runner.cam_tx = optax.adam(1e-3)
    runner.cam_opt_state = runner.cam_tx.init(runner.pose_vecs)

    before = np.asarray(runner.pose_vecs).copy()
    runner.run()
    after = np.asarray(runner.pose_vecs)
    assert not np.allclose(before, after)
    # quaternions should remain near unit norm after a few tiny steps
    qn = np.linalg.norm(after[:, :4], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=0.05)

    # SparseAdam semantics: a single step touches only the batch image's
    # row — other rows' params AND adam moments must be bit-identical
    # (torch SparseAdam materialises state only for touched rows)
    import jax
    import jax.numpy as jnp

    runner._sample_pixels(0)
    indices, model_input, ground_truth = runner.train_dataset.collate(
        [runner.train_dataset[1]]
    )
    batch, gt = runner._device_batch(model_input, ground_truth, indices)
    step = runner._get_step(False, False, batch, gt)
    p0 = np.asarray(runner.pose_vecs).copy()
    s0 = jax.tree_util.tree_map(np.asarray, runner.cam_opt_state)
    (params, pose_vecs, cam_state, *_rest) = step(
        runner.params, runner.pose_vecs, runner.cam_opt_state,
        runner.idr_opt_state, runner.sg_opt_state, batch, gt,
        jax.random.PRNGKey(11), jnp.float32(50.0),
    )
    p1 = np.asarray(pose_vecs)
    s1 = jax.tree_util.tree_map(np.asarray, cam_state)
    untouched = [i for i in range(p0.shape[0]) if i != int(indices[0])]
    assert untouched
    np.testing.assert_array_equal(p0[untouched], p1[untouched])
    assert not np.array_equal(p0[int(indices[0])], p1[int(indices[0])])
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
        if getattr(a, "shape", ()) == p0.shape:
            np.testing.assert_array_equal(a[untouched], b[untouched])


def test_view_diff_training_runs(scene_dir, tmp_path):
    conf = parse_string(TRAIN_CONF)
    conf.put("loss.view_diff_weight", 0.1)
    runner = IDRTrainRunner(
        conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps"), nepochs=1,
        max_niters=10, secondary_train_interval=-1, memory_capacity_level=12,
    )
    losses = []
    runner.log_freq = 1
    runner.log_scalars = lambda e, ld, f, a: losses.append(
        {k: float(v) for k, v in ld.items()}
    )
    runner.run()
    assert len(losses) >= 3
    assert all(np.isfinite(l["loss"]) for l in losses)
    # the view-diff term is computed (may be zero if no pixel is co-visible,
    # but on this 3-camera ring scene some overlap exists)
    assert any(l["view_diff_loss"] != 0.0 for l in losses)


def test_train_cameras_view_diff_exclusive(scene_dir, tmp_path):
    conf = parse_string(TRAIN_CONF)
    conf.put("loss.view_diff_weight", 0.1)
    conf.put("train.learning_rate_cam", 1e-3)
    with pytest.raises(ValueError):
        IDRTrainRunner(
            conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
            gamma=1.0, exps_folder_name=str(tmp_path / "exps"),
            train_cameras=True,
        )


def test_budget_overflow_auto_escalates(scene_dir, tmp_path):
    """When a compaction budget overflows, the trainer doubles it and
    rebuilds the jitted step (train.auto_escalate_budgets, default on) —
    exactness self-corrects instead of silently degrading rays. Budgets of
    2 on the 16x16 sphere scene (64 pixels/step over the 8-device mesh)
    overflow immediately; after escalation the budgets sit at the per-shard
    ray count, where compaction is trivially exact."""
    conf = parse_string(TRAIN_CONF)
    conf.put("model.ray_tracer.sampler_budget", 2)
    conf.put("model.ray_tracer.minsdf_budget", 2)
    runner = IDRTrainRunner(
        conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps"), nepochs=1,
        max_niters=6, secondary_train_interval=-1, memory_capacity_level=12,
    )
    assert runner.auto_escalate_budgets
    assert runner.model.ray_tracer.minsdf_budget == 2
    runner.run()
    # the sphere scene has ~70% miss pixels -> the min-SDF path overflows a
    # budget of 2 on every shard; escalation must have fired
    assert runner.model.ray_tracer.minsdf_budget > 2
    # cap: never beyond the per-shard ray count (64 pixels / 8 devices)
    assert runner.model.ray_tracer.minsdf_budget <= 8

    # and with escalation disabled the budgets stay put
    conf2 = parse_string(TRAIN_CONF)
    conf2.put("model.ray_tracer.sampler_budget", 2)
    conf2.put("model.ray_tracer.minsdf_budget", 2)
    conf2.put("train.auto_escalate_budgets", False)
    runner2 = IDRTrainRunner(
        conf=conf2, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps2"), nepochs=1,
        max_niters=4, secondary_train_interval=-1, memory_capacity_level=12,
    )
    runner2.run()
    assert runner2.model.ray_tracer.minsdf_budget == 2


def test_secondary_escalation_covers_every_budget(scene_dir, tmp_path):
    """The pooled secondary_overflow counter must escalate EVERY budgeted
    secondary knob — sampler, trace-compaction AND min-SDF (diff_geo render
    types run the secondary trace in training mode, whose min-SDF fallback
    is budgeted too). A knob left out would warn forever without restoring
    exactness."""
    import dataclasses as dc

    conf = parse_string(TRAIN_CONF)
    runner = IDRTrainRunner(
        conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps"), nepochs=1,
        secondary_train_interval=-1, memory_capacity_level=12,
    )
    sec = dc.replace(
        runner.model.ray_tracer, sampler_budget=2, minsdf_budget=2,
        compact_budget=2,
    )
    runner.model = dc.replace(runner.model, secondary_ray_tracer=sec)
    runner._escalate_budgets({"secondary_overflow": 7})
    sec2 = runner.model.secondary_ray_tracer
    assert sec2.sampler_budget > 2
    assert sec2.minsdf_budget > 2
    assert sec2.compact_budget > 2


def test_escalation_cap_covers_view_diff_pairing(scene_dir, tmp_path):
    """view-diff pairing concatenates a full paired view along the ray axis
    (_append_paired_view), doubling the per-step ray count — the escalation
    cap ('never beyond the ray count, where budgets are trivially exact')
    must cover the DOUBLED count, or a budget stuck at the unpaired count
    warns forever without restoring exactness."""
    import dataclasses as dc

    conf = parse_string(TRAIN_CONF)
    runner = IDRTrainRunner(
        conf=conf, data_split_dir=scene_dir, data_split_dir_test=scene_dir,
        gamma=1.0, exps_folder_name=str(tmp_path / "exps"), nepochs=1,
        secondary_train_interval=-1, memory_capacity_level=12,
    )
    # 64 pixels x R=1 over 8 devices -> 8 rays/shard unpaired
    n_unpaired = -(-runner.batch_size * runner.num_pixels
                   * max(runner.num_rays, 1) // runner.world_size)
    runner.model = dc.replace(
        runner.model,
        ray_tracer=dc.replace(runner.model.ray_tracer,
                              sampler_budget=n_unpaired),
    )

    # without pairing the budget already sits at the cap: no change
    assert runner.loss.view_diff_weight == 0
    runner._escalate_budgets({"sampler_overflow": 3})
    assert runner.model.ray_tracer.sampler_budget == n_unpaired

    # with view-diff pairing active the true per-shard count is doubled
    runner.loss = dc.replace(runner.loss, view_diff_weight=0.1)
    runner._escalate_budgets({"sampler_overflow": 3})
    assert runner.model.ray_tracer.sampler_budget == 2 * n_unpaired


def test_camera_adam_matches_torch_sparseadam():
    """The pose update machinery (optax.adam + touched-row masking +
    _mask_adam_rows, trainer.py:360-370) must reproduce
    torch.optim.SparseAdam over multiple steps with varying touched-row
    patterns: touched rows step with global-step bias correction, untouched
    rows keep params AND moments bit-still."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import optax

    from nefii_tpu.training.trainer import _mask_adam_rows

    n_img, lr = 6, 1e-3
    rng = np.random.RandomState(0)
    pose0 = rng.randn(n_img, 7).astype(np.float32)

    # torch: sparse embedding + SparseAdam
    emb = torch.nn.Embedding(n_img, 7, sparse=True)
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(pose0))
    opt = torch.optim.SparseAdam(emb.parameters(), lr=lr)

    # ours: the trainer's exact update
    cam_tx = optax.adam(lr)
    pose_j = jnp.asarray(pose0)
    state_j = cam_tx.init(pose_j)

    patterns = [[0, 2], [0, 3, 4], [2], [0, 2, 3]]  # row 1 and 5 never touched
    for t, rows in enumerate(patterns):
        gvals = rng.randn(len(rows), 7).astype(np.float32)

        # torch step: loss touching exactly `rows`
        opt.zero_grad()
        out = emb(torch.tensor(rows))
        (out * torch.tensor(gvals)).sum().backward()
        opt.step()

        # our step: dense grad, zero off-batch rows (the masked-mean loss
        # produces exactly this)
        g = np.zeros((n_img, 7), np.float32)
        g[rows] = gvals
        g = jnp.asarray(g)
        updates, new_state = cam_tx.update(g, state_j, pose_j)
        touched = jnp.abs(g).sum(-1, keepdims=True) > 0
        pose_j = jnp.where(touched, optax.apply_updates(pose_j, updates), pose_j)
        state_j = _mask_adam_rows(new_state, state_j, touched)

    ours = np.asarray(pose_j)
    theirs = emb.weight.detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    # never-touched rows bit-identical to init
    np.testing.assert_array_equal(ours[[1, 5]], pose0[[1, 5]])
