"""SceneDataset tests on a tiny synthetic scene written to tmp."""

import json
import os

import numpy as np
import pytest

from nefii_tpu.datasets.scene_dataset import SceneDataset
from nefii_tpu.utils import exr


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    (d / "image").mkdir()
    (d / "mask").mkdir()
    H = W = 16
    rng = np.random.RandomState(0)
    cam = {}
    import imageio.v2 as imageio

    for i in range(3):
        img = rng.rand(H, W, 3).astype(np.float32)
        exr.write(str(d / "image" / f"{i:03d}.exr"), img)
        mask = (rng.rand(H, W) > 0.3).astype(np.uint8) * 255
        imageio.imwrite(str(d / "mask" / f"{i:03d}.png"), mask)
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2] = K[1, 2] = 8.0
        W2C = np.eye(4)
        W2C[2, 3] = 2.0 + i
        cam[f"{i:03d}.exr"] = {"K": K.reshape(-1).tolist(), "W2C": W2C.reshape(-1).tolist()}
    with open(d / "cam_dict_norm.json", "w") as f:
        json.dump(cam, f)
    return str(d)


def test_load_and_getitem(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    assert len(ds) == 3
    assert ds.img_res == [16, 16]
    idx, sample, gt = ds[1]
    assert idx == 1
    assert sample["uv"].shape == (256, 2)
    assert gt["rgb"].shape == (256, 3)
    assert sample["object_mask"].shape == (256,)
    assert sample["pose"].shape == (4, 4)
    # uv layout: x (col) first — pixel (u=5, v=2) at flat index 2*16+5
    np.testing.assert_allclose(sample["uv"][2 * 16 + 5], [5.0, 2.0])


def test_gamma_applied(scene_dir):
    ds1 = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    ds2 = SceneDataset(gamma=2.2, instance_dir=scene_dir, train_cameras=False)
    np.testing.assert_allclose(
        ds2.rgb_images[0], ds1.rgb_images[0] ** 2.2, atol=1e-5
    )


def test_sampling_and_rays(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    rng = np.random.default_rng(0)
    ds.change_sampling_idx(32, rng)
    ds.change_sampling_rays(4, rng)
    _, sample, gt = ds[0]
    assert sample["uv"].shape == (32, 4, 2)
    assert gt["rgb"].shape == (32, 3)
    # jitter is within +-0.5 of the base pixel
    base = sample["uv"].mean(1)
    assert np.abs(sample["uv"] - base[:, None, :]).max() < 1.0

    ds.change_sampling_rays(-1)
    ds.change_sampling_idx(-1)
    _, sample, _ = ds[0]
    assert sample["uv"].shape == (256, 2)


def test_patch_sampling(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    ds.change_sampling_idx_patch(5, r_patch=1, rng=np.random.default_rng(1))
    assert ds.sampling_idx.shape == (20,)
    # each patch is 4 contiguous-in-2x2 pixels
    patch = ds.sampling_idx.reshape(5, 4)
    W = 16
    for p in patch:
        vs, us = p // W, p % W
        assert us.max() - us.min() == 1 and vs.max() - vs.min() == 1


def test_scatter_sampling(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    rng = np.random.default_rng(2)
    ds.change_sampling_idx(40, rng)
    full = ds.sampling_idx.copy()
    parts = []
    for rank in range(4):
        ds.sampling_idx = full.copy()
        ds.scatter_sampling_idx(rank, 4)
        parts.append(ds.sampling_idx)
    got = np.concatenate(parts)
    np.testing.assert_array_equal(got, full)  # disjoint cover, order preserved


def test_subsample(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False, subsample=0.5)
    assert ds.img_res == [8, 8]
    assert ds.rgb_images[0].shape == (64, 3)
    assert abs(ds.intrinsics_all[0][0, 0] - 10.0) < 1e-5


def test_collate(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=False)
    idxs, samples, gts = SceneDataset.collate([ds[0], ds[1]])
    assert idxs.shape == (2,)
    assert samples["uv"].shape == (2, 256, 2)
    assert gts["rgb"].shape == (2, 256, 3)


def test_pose_init_quat(scene_dir):
    ds = SceneDataset(gamma=1.0, instance_dir=scene_dir, train_cameras=True)
    q = ds.get_pose_init()
    assert q.shape == (3, 7)
    np.testing.assert_allclose(np.linalg.norm(q[:, :4], axis=1), 1.0, atol=1e-5)
