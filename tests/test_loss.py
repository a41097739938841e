"""IDRLoss tests: masked reductions, BCE mask loss, SSIM, patch variances."""

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.loss import IDRLoss, ssim_loss_fn

import pytest

pytestmark = pytest.mark.fast  # sub-minute math/unit tests


def _loss(**kw):
    base = dict(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.1,
        mask_weight=100.0, alpha=50.0, normalsmooth_weight=1.0, r_patch=1,
        loss_type="L1", env_loss_type="L2", background_rgb_weight=1.0,
    )
    base.update(kw)
    return IDRLoss(**base)


def _outputs(N=16, seed=0, hit_frac=0.75):
    rng = np.random.RandomState(seed)
    net_mask = jnp.asarray(rng.rand(N) < hit_frac)
    obj_mask = jnp.asarray(rng.rand(N) < 0.9)
    return {
        "idr_rgb_values": jnp.asarray(rng.rand(N, 3).astype(np.float32)),
        "sg_rgb_values": jnp.asarray(rng.rand(N, 3).astype(np.float32)),
        "normal_values": jnp.asarray(rng.randn(N, 3).astype(np.float32)),
        "sdf_output": jnp.asarray(rng.randn(N, 1).astype(np.float32) * 0.1),
        "network_object_mask": net_mask,
        "object_mask": obj_mask,
        "grad_theta": jnp.asarray(rng.randn(N, 3).astype(np.float32)),
        "sg_roughness_values": jnp.asarray(rng.rand(N, 1).astype(np.float32)),
        "sg_specular_rgb_values": jnp.asarray(rng.rand(N, 3).astype(np.float32)),
    }, {"rgb": jnp.asarray(rng.rand(1, N, 3).astype(np.float32))}


def test_rgb_loss_masked_mean_matches_manual():
    loss = _loss()
    out, gt = _outputs()
    mask = np.asarray(out["network_object_mask"] & out["object_mask"])
    d = loss(out, gt)
    manual = np.abs(
        np.asarray(out["idr_rgb_values"])[mask] - np.asarray(gt["rgb"]).reshape(-1, 3)[mask]
    ).mean()
    np.testing.assert_allclose(float(d["idr_rgb_loss"]), manual, rtol=1e-5)


def test_mask_loss_matches_torch_formula():
    loss = _loss()
    out, gt = _outputs()
    sdf = np.asarray(out["sdf_output"])[:, 0]
    obj = np.asarray(out["object_mask"]).astype(np.float32)
    net = np.asarray(out["network_object_mask"])
    m = ~(net & (obj > 0.5))
    x = -50.0 * sdf
    bce = np.maximum(x, 0) - x * obj + np.log1p(np.exp(-np.abs(x)))
    expected = (1 / 50.0) * bce[m].sum() / sdf.shape[0]
    got = float(loss(out, gt)["mask_loss"])
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_eikonal_loss():
    loss = _loss()
    out, gt = _outputs()
    g = np.asarray(out["grad_theta"])
    expected = ((np.linalg.norm(g, axis=1) - 1) ** 2).mean()
    np.testing.assert_allclose(float(loss(out, gt)["eikonal_loss"]), expected, rtol=1e-5)


def test_empty_masks_give_zero():
    loss = _loss()
    out, gt = _outputs()
    out["network_object_mask"] = jnp.zeros_like(out["network_object_mask"])
    d = loss(out, gt)
    assert float(d["idr_rgb_loss"]) == 0.0
    assert float(d["sg_rgb_loss"]) == 0.0
    assert np.isfinite(float(d["loss"]))


def test_normalsmooth_patch_variance():
    # r_patch=1 -> patches of 4 pixels; constant normals -> zero loss
    loss = _loss()
    out, gt = _outputs(N=16)
    out["normal_values"] = jnp.ones((16, 3))
    out["network_object_mask"] = jnp.ones(16, bool)
    out["object_mask"] = jnp.ones(16, bool)
    d = loss(out, gt)
    np.testing.assert_allclose(float(d["normalsmooth_loss"]), 0.0, atol=1e-7)

    # alternating normals -> positive variance
    nv = np.ones((16, 3), np.float32)
    nv[::2] = -1
    out["normal_values"] = jnp.asarray(nv)
    d2 = loss(out, gt)
    assert float(d2["normalsmooth_loss"]) > 0.5


def test_ssim_identical_images_zero():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
    val = ssim_loss_fn(img, img)
    np.testing.assert_allclose(float(val), 0.0, atol=1e-5)
    # different images -> positive
    img2 = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
    assert float(ssim_loss_fn(img, img2)) > 0.1


def test_ssim_masked():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    noise = img.at[:, :, :8].add(0.5)  # corrupt the top half
    full_mask = jnp.ones((1, 1, 16, 16), bool)
    bottom_mask = jnp.asarray(np.pad(np.ones((1, 1, 8, 16), bool), ((0, 0), (0, 0), (8, 0), (0, 0))))
    lossy = float(ssim_loss_fn(noise, img, full_mask))
    clean = float(ssim_loss_fn(noise, img, bottom_mask))
    assert clean < lossy


def test_view_diff_loss():
    loss = _loss(view_diff_weight=1.0)
    B, S = 1, 8
    rng = np.random.RandomState(2)
    rgb = rng.rand(2 * B * S, 3).astype(np.float32)
    gt = rng.rand(2 * B, S, 3).astype(np.float32)
    out, _ = _outputs(N=2 * B * S)
    out["sg_rgb_values"] = jnp.asarray(rgb)
    out["network_object_mask"] = jnp.ones(2 * B * S, bool)
    out["object_mask"] = jnp.ones(2 * B * S, bool)
    gt_d = {"rgb": jnp.asarray(gt), "pixel_visible": jnp.ones((B, S), bool)}
    d = loss(out, gt_d)
    r = rgb.reshape(2, B, S, 3)
    g = gt.reshape(2, B, S, 3)
    expected = np.abs((r[0] - r[1]) - (g[0] - g[1])).mean()
    np.testing.assert_allclose(float(d["view_diff_loss"]), expected, rtol=1e-5)


def test_total_is_weighted_sum_and_jits():
    loss = _loss()
    out, gt = _outputs()
    d = jax.jit(lambda o, g: loss(o, g))(out, gt)
    total = (
        1.0 * d["idr_rgb_loss"] + 1.0 * d["sg_rgb_loss"] + 0.1 * d["eikonal_loss"]
        + 100.0 * d["mask_loss"] + 1.0 * d["normalsmooth_loss"]
        + 1.0 * d["background_rgb_loss"]
    )
    np.testing.assert_allclose(float(d["loss"]), float(total), rtol=1e-5)
