"""Tools-layer tests: metrics, envmap fitting/rotation, converters, surface
export, and the render-script end-to-end flow."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefii_tpu.utils import metrics


def test_psnr_ssim_identity():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    assert metrics.psnr(img, img) > 100
    assert abs(metrics.ssim(img, img) - 1.0) < 1e-6
    assert abs(metrics.ms_ssim(img, img) - 1.0) < 1e-4

    noisy = np.clip(img + rng.randn(64, 64, 3) * 0.1, 0, 1).astype(np.float32)
    p = metrics.psnr(noisy, img)
    assert 15 < p < 25  # sigma 0.1 -> ~20dB
    assert metrics.ssim(noisy, img) < 0.99
    assert metrics.ms_ssim(noisy, img) < 0.999


def test_psnr_masked():
    img = np.zeros((8, 8, 3), np.float32)
    noisy = img.copy()
    noisy[:4] = 1.0  # corrupt the top half
    mask = np.zeros((8, 8), bool)
    mask[4:] = True
    assert metrics.psnr(noisy, img, mask) > 100  # clean region only
    assert metrics.psnr(noisy, img) < 10


def test_fit_envmap_sg_converges():
    from nefii_tpu.ops.sg import compute_envmap
    from nefii_tpu.scripts.fit_envmap_with_sg import fit_envmap_sg

    # ground truth: 4 known SGs
    gt_sgs = np.array(
        [
            [0, 1, 0, 10, 2, 1, 0.5],
            [1, 0, 0, 6, 0.5, 1, 1],
            [0, 0, 1, 8, 1, 0.2, 0.2],
            [0, -1, 0, 5, 0.3, 0.3, 0.9],
        ],
        np.float32,
    )
    gt_env = np.asarray(compute_envmap(jnp.asarray(gt_sgs), 32, 64))
    lgt, loss = fit_envmap_sg(gt_env, num_sgs=8, n_iter=800, lr=5e-2, seed=0)
    assert loss < 0.01 * gt_env.var(), loss


def test_rotate_lightsg():
    from nefii_tpu.scripts.envmap_tools import euler_rotation, rotate_lightsg

    rng = np.random.RandomState(1)
    lgt = rng.randn(16, 7).astype(np.float32)
    rot = euler_rotation("z", [90])
    out = rotate_lightsg(lgt, rot)
    # lambdas/mus preserved (abs), lobes rotated and unit-norm
    np.testing.assert_allclose(out[:, 3], np.abs(lgt[:, 3]), rtol=1e-5)
    np.testing.assert_allclose(out[:, 4:], np.abs(lgt[:, 4:]), rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[:, :3], axis=1), 1.0, atol=1e-5)
    lobes = lgt[:, :3] / np.linalg.norm(lgt[:, :3], axis=1, keepdims=True)
    # 90deg about z: (x,y) -> (-y,x)
    np.testing.assert_allclose(out[:, 0], -lobes[:, 1], atol=1e-5)
    np.testing.assert_allclose(out[:, 1], lobes[:, 0], atol=1e-5)


def test_converters(tmp_path):
    from nefii_tpu.scripts.converters import neus2physg

    src = tmp_path / "undist"
    (src / "image").mkdir(parents=True)
    (src / "mask").mkdir()
    import imageio.v2 as imageio

    for i in range(2):
        imageio.imwrite(str(src / "image" / f"{i:03d}.png"), np.zeros((8, 8, 3), np.uint8))
        imageio.imwrite(str(src / "mask" / f"{i:03d}.png"), np.full((8, 8), 255, np.uint8))

    # synthetic cameras_sphere: world_mat = K @ W2C, scale_mat = unit
    data = {}
    K = np.eye(4); K[0, 0] = K[1, 1] = 20.0; K[0, 2] = K[1, 2] = 4.0
    for i in range(2):
        W2C = np.eye(4); W2C[2, 3] = 2.0 + i
        data[f"world_mat_{i}"] = K @ W2C
        data[f"camera_mat_{i}"] = K
        data[f"camera_mat_inv_{i}"] = np.linalg.inv(K)
        data[f"scale_mat_{i}"] = np.diag([0.5, 0.5, 0.5, 1.0])
        data[f"scale_mat_inv_{i}"] = np.diag([2.0, 2.0, 2.0, 1.0])
        data[f"w2c_mat_{i}"] = W2C
    np.savez(str(src / "cameras_sphere.npz"), **data)

    out = tmp_path / "converted"
    neus2physg(str(src), str(out), "neus")
    for tag in ("train", "test"):
        cam_path = out / tag / "cam_dict_norm.json"
        assert cam_path.exists()
        cams = json.load(open(cam_path))
        assert len(cams) == 2
        W2C = np.array(cams["000000"]["W2C"]).reshape(4, 4)
        # normalised W2C = W2C @ diag(r,r,r,1): rotation scaled by the
        # sphere radius, translation (center=0 here) unchanged
        np.testing.assert_allclose(W2C[2, 2], 0.5, atol=1e-6)
        np.testing.assert_allclose(W2C[2, 3], 2.0, atol=1e-6)
        assert (out / tag / "image" / "000.png").exists()


def test_surface_export(tmp_path):
    from nefii_tpu.utils.mesh_io import load_mesh
    from nefii_tpu.utils.plots import export_surface, get_surface_trace

    sdf = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5
    verts, faces = get_surface_trace(sdf, resolution=48, bound=1.0)
    assert len(verts) > 200 and len(faces) > 200
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 0.5, atol=0.03)

    path = str(tmp_path / "surface.ply")
    export_surface(sdf, path, resolution=32)
    v2, f2 = load_mesh(path)
    assert len(v2) > 50


def test_debug_helper_watches():
    from nefii_tpu.utils import debug_helper as dbg

    dbg.set_debug(True)
    dbg.clear()
    x = jnp.array([1.0, 2.0, 3.0])

    def f(v):
        v = dbg.watch_value(v, "x")
        v = dbg.watch_gradient(v, "x")
        return (v**2).sum()

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [2, 4, 6])
    rec = dbg.get_records()
    assert "x/value" in rec and "x/grad" in rec
    assert abs(rec["x/value"]["mean"] - 2.0) < 1e-6
    dbg.set_debug(False)


# ---------------------------------------------------------------------------
# LPIPS (JAX implementation, torch-pinned semantics)
# ---------------------------------------------------------------------------

def _random_lpips_torch_state(rng):
    """Random weights in the lpips.LPIPS(net='alex') state-dict layout."""
    import torch

    tv_idx = (0, 3, 6, 8, 10)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    state = {}
    for i, (tv, shp) in enumerate(zip(tv_idx, shapes)):
        state[f"net.slice{i + 1}.{tv}.weight"] = torch.tensor(
            rng.randn(*shp).astype(np.float32) * 0.05)
        state[f"net.slice{i + 1}.{tv}.bias"] = torch.tensor(
            rng.randn(shp[0]).astype(np.float32) * 0.1)
        state[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.randn(1, shp[0], 1, 1)).astype(np.float32))
    return state


def _lpips_torch_reference(state, a_np, b_np):
    """Independent torch.nn.functional forward of the LPIPS-alex formula
    (scaling layer -> AlexNet features -> channel-unit-normalize -> squared
    diff -> 1x1 lin weights -> spatial mean -> layer sum)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    tv_idx = (0, 3, 6, 8, 10)
    convs = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]

    def feats(x):
        x = (x - shift) / scale
        out = []
        for i, ((stride, pad), tv) in enumerate(zip(convs, tv_idx)):
            x = F.conv2d(x, state[f"net.slice{i + 1}.{tv}.weight"],
                         state[f"net.slice{i + 1}.{tv}.bias"],
                         stride=stride, padding=pad)
            x = F.relu(x)
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    a = torch.tensor(np.moveaxis(a_np, -1, 0)[None]) * 2 - 1
    b = torch.tensor(np.moveaxis(b_np, -1, 0)[None]) * 2 - 1
    total = 0.0
    for i, (x, y) in enumerate(zip(feats(a), feats(b))):
        nx = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny).pow(2) * state[f"lin{i}.model.1.weight"]
        total = total + d.sum(1).mean()
    return float(total)


def test_lpips_jax_matches_torch_semantics(tmp_path):
    """The JAX LPIPS pipeline (conv strides/padding, max-pool, channel
    normalization, lin heads) must match a torch.nn.functional forward of
    the same architecture bit-for-tolerance on random weights — so when a
    user supplies real pretrained weights, the metric is the reference's."""
    import torch

    from nefii_tpu.utils import lpips_jax

    rng = np.random.RandomState(0)
    state = _random_lpips_torch_state(rng)
    ckpt = tmp_path / "lpips_full.pth"
    torch.save(state, str(ckpt))

    a = rng.rand(96, 80, 3).astype(np.float32)
    b = np.clip(a + rng.randn(96, 80, 3).astype(np.float32) * 0.1, 0, 1)

    want = _lpips_torch_reference(state, a, b)
    weights = lpips_jax.load_weights(str(ckpt))
    got = lpips_jax.lpips_distance(weights, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # identical images -> zero distance (up to XLA fusion reassociation)
    assert lpips_jax.lpips_distance(weights, a, a) < 1e-10

    # metrics.lpips routes through the JAX path when weights are supplied
    got2 = metrics.lpips(a, b, weights_path=str(ckpt))
    np.testing.assert_allclose(got2, got, rtol=1e-5)


def test_lpips_weights_loading_variants(tmp_path):
    """Directory layout (torchvision alexnet body + lpips lin heads as two
    files) and npz round-trip both load; incomplete weights raise."""
    import torch

    from nefii_tpu.utils import lpips_jax

    rng = np.random.RandomState(1)
    state = _random_lpips_torch_state(rng)
    tv_idx = (0, 3, 6, 8, 10)
    body = {}
    lins = {}
    for i, tv in enumerate(tv_idx):
        body[f"features.{tv}.weight"] = state[f"net.slice{i + 1}.{tv}.weight"]
        body[f"features.{tv}.bias"] = state[f"net.slice{i + 1}.{tv}.bias"]
        lins[f"lin{i}.model.1.weight"] = state[f"lin{i}.model.1.weight"]
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(body, str(d / "alexnet.pth"))
    torch.save(lins, str(d / "alex_lins.pth"))

    w_dir = lpips_jax.load_weights(str(d))
    full = tmp_path / "full.pth"
    torch.save(state, str(full))
    w_full = lpips_jax.load_weights(str(full))
    for k in w_full:
        np.testing.assert_array_equal(w_dir[k], w_full[k])

    npz = tmp_path / "w.npz"
    lpips_jax.save_npz(w_full, str(npz))
    w_npz = lpips_jax.load_weights(str(npz))
    for k in w_full:
        np.testing.assert_array_equal(w_npz[k], w_full[k])

    with pytest.raises(ValueError, match="incomplete"):
        lpips_jax.load_weights(str(d / "alex_lins.pth"))


def test_lpips_export_cli(tmp_path):
    """`python -m nefii_tpu.utils.lpips_jax --export-from-torch` converts
    user-supplied torch checkpoints to the npz the evaluator loads (VERDICT
    r3 #9: the one-command import path for users with egress)."""
    import subprocess
    import sys

    import torch

    from nefii_tpu.utils import lpips_jax

    rng = np.random.RandomState(2)
    state = _random_lpips_torch_state(rng)
    src = tmp_path / "lpips_full.pth"
    torch.save(state, str(src))
    out = tmp_path / "alex.npz"
    r = subprocess.run(
        [sys.executable, "-m", "nefii_tpu.utils.lpips_jax",
         "--export-from-torch", str(out), str(src)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    w_npz = lpips_jax.load_weights(str(out))
    w_src = lpips_jax.load_weights(str(src))
    for k in w_src:
        np.testing.assert_array_equal(w_npz[k], w_src[k])

    # incomplete source -> non-zero exit with an actionable message
    lins_only = tmp_path / "lins.pth"
    torch.save({k: v for k, v in state.items() if "lin" in k}, str(lins_only))
    r2 = subprocess.run(
        [sys.executable, "-m", "nefii_tpu.utils.lpips_jax",
         "--export-from-torch", str(tmp_path / "bad.npz"), str(lins_only)],
        capture_output=True, text=True)
    assert r2.returncode != 0
    assert "incomplete" in (r2.stdout + r2.stderr)


@pytest.mark.slow  # ~4 min: 300-per-axis fine grid on the CPU mesh
def test_surface_high_res_mesh():
    """VERDICT r4 #6: the two-stage coarse-to-fine export (reference
    utils/plots.py:169-241) produces a >=300-per-shortest-axis mesh of an
    analytic blobby scene with vertex error below one grid cell, and drops
    disconnected satellite components."""
    from nefii_tpu.utils.plots import get_surface_high_res_mesh, get_surface_trace

    centers = jnp.asarray(
        [[0.25, 0.0, 0.0], [-0.25, 0.1, 0.0], [0.0, -0.2, 0.15]]
    )
    radii = jnp.asarray([0.4, 0.35, 0.3])

    def blobby(p):
        d = jnp.linalg.norm(p[:, None, :] - centers[None], axis=-1) - radii[None]
        return d.min(-1)

    # a small far-away satellite sphere that the largest-component filter
    # must discard (the reference keeps only areas.argmax())
    def scene(p):
        sat = jnp.linalg.norm(p - jnp.asarray([0.0, 0.0, -0.85]), axis=-1) - 0.05
        return jnp.minimum(blobby(p), sat)

    res = 300
    verts, faces = get_surface_high_res_mesh(scene, resolution=res, bound=1.0)
    coarse_v, _ = get_surface_trace(scene, resolution=100, bound=1.0)
    assert len(verts) > 4 * len(coarse_v), (len(verts), len(coarse_v))

    # satellite gone: every vertex belongs to the blobby union
    sat_d = np.linalg.norm(verts - np.array([0.0, 0.0, -0.85]), axis=1)
    assert sat_d.min() > 0.2, sat_d.min()

    # vertex error below one fine-grid cell: the blobby bbox spans <= 1.3 +
    # 2*eps on its shortest axis, so the cell is < 1.8/299
    err = np.abs(np.asarray(blobby(jnp.asarray(verts))))
    cell = 1.8 / (res - 1)
    assert err.max() <= cell, (err.max(), cell)
    # and the bulk of vertices are much tighter than the cell
    assert np.median(err) < cell / 4


# ---------------------------------------------------------------------------
# per-machine persistent compile cache (utils/compile_cache.py)
# ---------------------------------------------------------------------------

def test_compile_cache_dir_is_host_keyed(tmp_path, monkeypatch):
    """Cache dirs embed a host-feature hash: a foreign machine's XLA:CPU
    entries (whose deserialization stall blew the Gloo 30 s collective-init
    deadline in the 2-process cluster test) land in a DIFFERENT directory
    and can never be loaded here."""
    from nefii_tpu.utils import compile_cache

    base = str(tmp_path / "cache")
    d = compile_cache.cache_dir(base)
    assert d.startswith(base + "-")
    assert len(d[len(base) + 1:]) == 12
    # deterministic on the same host
    assert d == compile_cache.cache_dir(base)

    # a host with different CPU features gets a different directory
    monkeypatch.setattr(compile_cache.platform, "machine", lambda: "other-isa")
    monkeypatch.setattr(
        compile_cache, "open",
        lambda *a, **k: (_ for _ in ()).throw(OSError()), raising=False)
    assert compile_cache.cache_dir(base) != d


def test_compile_cache_setup_points_jax_at_host_dir(tmp_path):
    from nefii_tpu.utils import compile_cache

    class FakeConfig:
        def __init__(self):
            self.updates = {}

        def update(self, k, v):
            self.updates[k] = v

    class FakeJax:
        config = FakeConfig()

    base = str(tmp_path / "cache")
    d = compile_cache.setup(FakeJax, min_compile_secs=1.5, base=base)
    assert d == compile_cache.cache_dir(base)
    assert FakeJax.config.updates["jax_compilation_cache_dir"] == d
    assert FakeJax.config.updates[
        "jax_persistent_cache_min_compile_time_secs"] == 1.5

    class BrokenJax:
        class config:
            @staticmethod
            def update(k, v):
                raise RuntimeError("no such flag")

    assert compile_cache.setup(BrokenJax, base=base) == ""
