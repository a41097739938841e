"""Determinism: two training runs with the same seed produce identical
parameters (SURVEY.md §5 — the functional-purity answer to race detection)."""

import jax
import numpy as np

from nefii_tpu.config import parse_string
from nefii_tpu.training.trainer import IDRTrainRunner

from test_trainer import TRAIN_CONF, scene_dir  # noqa: F401
import pytest

pytestmark = pytest.mark.slow  # integration tests: minutes on CPU


def _run(scene_dir, tmp_path, tag):
    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF), data_split_dir=scene_dir,
        data_split_dir_test=scene_dir, gamma=1.0,
        exps_folder_name=str(tmp_path / f"exps_{tag}"), nepochs=2,
        max_niters=100, secondary_train_interval=4, secondary_batch_size=8,
        memory_capacity_level=12, seed=7,
    )
    runner.run()
    return runner.params


def test_same_seed_identical_params(scene_dir, tmp_path):
    p1 = _run(scene_dir, tmp_path, "a")
    p2 = _run(scene_dir, tmp_path, "b")
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_differs(scene_dir, tmp_path):
    p1 = _run(scene_dir, tmp_path, "c")
    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF), data_split_dir=scene_dir,
        data_split_dir_test=scene_dir, gamma=1.0,
        exps_folder_name=str(tmp_path / "exps_d"), nepochs=2,
        max_niters=100, secondary_train_interval=4, secondary_batch_size=8,
        memory_capacity_level=12, seed=8,
    )
    runner.run()
    diff = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(runner.params)
        )
    )
    assert diff > 0
