"""Trainer visualisation panels + PixelPairGenerator class API."""

import os

import jax
import numpy as np

from nefii_tpu.config import parse_string
from nefii_tpu.training.trainer import IDRTrainRunner

from test_trainer import TRAIN_CONF, scene_dir  # noqa: F401
import pytest

pytestmark = pytest.mark.slow  # integration tests: minutes on CPU


def test_vis_writes_panels(scene_dir, tmp_path):
    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF), data_split_dir=scene_dir,
        data_split_dir_test=scene_dir, gamma=1.0,
        exps_folder_name=str(tmp_path / "exps"), nepochs=1, max_niters=2,
        secondary_train_interval=-1, memory_capacity_level=12,
    )
    runner.vis("train", 0)
    runner.vis("test", 0)
    for f in ("train_0.png", "train_0_sg_rgb.exr", "train_0_envmap.exr",
              "test_0.png", "surface_0.obj"):
        assert os.path.exists(os.path.join(runner.plots_dir, f)), f
    import imageio.v2 as imageio

    H, W = runner.plot_dataset.img_res
    panel = imageio.imread(os.path.join(runner.plots_dir, "train_0.png"))
    # 4 rows: gt|sg|idr, diffuse|specular|normal, albedo|rough|spec, depth|--
    assert panel.shape == (4 * H, 3 * W, 3)
    # depth tile: hits darker than the white background, some variation
    depth_tile = panel[3 * H :, :W]
    assert depth_tile.min() < 250, "depth tile is blank"
    # surface OBJ is a non-trivial mesh
    with open(os.path.join(runner.plots_dir, "surface_0.obj")) as f:
        txt = f.read()
    assert txt.count("\nv ") + txt.startswith("v ") > 10
    assert "f " in txt


def test_pixel_pair_generator_class(scene_dir, tmp_path):
    from nefii_tpu.models.pixel_pair_generator import PixelPairGenerator

    runner = IDRTrainRunner(
        conf=parse_string(TRAIN_CONF), data_split_dir=scene_dir,
        data_split_dir_test=scene_dir, gamma=1.0,
        exps_folder_name=str(tmp_path / "exps"),
    )
    ds = runner.train_dataset
    gen = PixelPairGenerator(ds, runner.model, runner.params)
    import jax.numpy as jnp

    idx, sample, _ = ds[0]
    _, sample, _ = ds.collate([(idx, sample, {"rgb": np.zeros((1, 3))})])
    query = {
        "intrinsics": jnp.asarray(sample["intrinsics"]),
        "pose": jnp.asarray(sample["pose"]),
        "uv": jnp.asarray(sample["uv"][:, :32]),
        "object_mask": jnp.asarray(sample["object_mask"][:, :32]),
    }
    paired = gen.find_paired_pixel(query, np.array([1]), key=jax.random.PRNGKey(0))
    assert paired["uv"].shape == (1, 32, 2)
    assert paired["gt_rgb"].shape == (1, 32, 3)
    assert paired["pixel_visible"].shape == (32,)
