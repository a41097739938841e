"""Camera math unit tests — closed-form geometric checks."""

import jax.numpy as jnp
import numpy as np

from nefii_tpu.utils import camera

import pytest

pytestmark = pytest.mark.fast  # sub-minute math/unit tests


def _look_at_pose(eye, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    """c2w pose with +z forward (IDR/NeFII convention)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = -true_up
    pose[:3, 2] = fwd
    pose[:3, 3] = eye
    return pose


def _intrinsics(f, cx, cy):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2] = cx
    K[1, 2] = cy
    return K


def test_center_pixel_ray_points_forward():
    eye = np.array([0.0, 0.0, -3.0], dtype=np.float32)
    pose = _look_at_pose(eye)[None]
    K = _intrinsics(500.0, 256.0, 256.0)[None]
    uv = jnp.array([[[256.0, 256.0]]])  # principal point
    ray_dirs, cam_loc = camera.get_camera_params(uv, jnp.asarray(pose), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(cam_loc[0]), eye, atol=1e-6)
    # the center ray must point from the camera at the origin
    expected = -eye / np.linalg.norm(eye)
    np.testing.assert_allclose(np.asarray(ray_dirs[0, 0]), expected, atol=1e-5)


def test_project_unproject_roundtrip():
    rng = np.random.RandomState(0)
    eye = np.array([1.0, 2.0, -3.0], dtype=np.float32)
    pose = _look_at_pose(eye)[None]
    K = _intrinsics(420.0, 320.0, 240.0)[None]
    uv = jnp.asarray(rng.uniform(50, 500, size=(1, 64, 2)).astype(np.float32))
    ray_dirs, cam_loc = camera.get_camera_params(uv, jnp.asarray(pose), jnp.asarray(K))
    # walk along each ray and re-project
    t = rng.uniform(1.0, 5.0, size=(1, 64, 1)).astype(np.float32)
    pts = cam_loc[:, None, :] + jnp.asarray(t) * ray_dirs
    uv2 = camera.points2uv(pts, jnp.asarray(pose), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-3, atol=5e-2)


def test_sphere_intersection_closed_form():
    cam_loc = jnp.array([[0.0, 0.0, -3.0]])
    # ray through origin: hits unit sphere at t = 2 and t = 4
    d_hit = jnp.array([[[0.0, 0.0, 1.0]]])
    inter, mask = camera.get_sphere_intersection(cam_loc, d_hit, r=1.0)
    assert bool(mask[0, 0])
    np.testing.assert_allclose(np.asarray(inter[0, 0]), [2.0, 4.0], atol=1e-5)
    # ray pointing away misses
    d_miss = jnp.array([[[0.0, 1.0, 0.0]]])
    _, mask2 = camera.get_sphere_intersection(cam_loc, d_miss, r=1.0)
    assert not bool(mask2[0, 0])


def test_quat_rot_roundtrip():
    rng = np.random.RandomState(1)
    q = rng.randn(8, 4).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    R = camera.quat_to_rot(jnp.asarray(q))
    q2 = camera.rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-4)
    # rotation matrices are orthonormal
    RtR = jnp.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(np.asarray(RtR), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_factorize_roundtrip():
    rng = np.random.RandomState(2)
    K = np.array([[400.0, 2.0, 320.0], [0, 410.0, 240.0], [0, 0, 1.0]])
    # random rotation via QR
    A = rng.randn(3, 3)
    R, _ = np.linalg.qr(A)
    if np.linalg.det(R) < 0:
        R = -R
    t = rng.randn(3, 1)
    P = K @ np.hstack([R, t])
    K2, R2, t2 = camera.factorize(P)
    np.testing.assert_allclose(K2, K, atol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)
