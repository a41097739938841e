"""Camera math — device-side (jnp) ray generation / projection utilities.

TPU-native re-design of the reference's `utils/rend_util.py` camera helpers:
  - get_camera_params  (rend_util.py:90-117)
  - lift / project     (rend_util.py:129-158)
  - quat_to_rot / rot_to_quat (rend_util.py:161-198)
  - get_sphere_intersection  (rend_util.py:200-221)
  - get_depth / points2uv    (rend_util.py:223-265)

All functions are pure, jit-friendly (static shapes, no data-dependent
control flow), fp32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import linalg


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixel coords at depth z to homogeneous camera coords.

    x, y, z: [B, S];  intrinsics: [B, 4, 4] (or [B, 3, 3] upper-left used).
    Returns [B, S, 4].
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack((x_lift, y_lift, z, jnp.ones_like(z)), axis=-1)


def project(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space points to pixel coords. x,y,z: [B,S] -> [B,S,2]."""
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    u = x / z * fx + cx - cy * sk / fy + sk * y / fy
    v = y / z * fy + cy
    return jnp.stack((u, v), axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalise quaternion(s) [B,4] (w,x,y,z) -> rotation matrices [B,3,3]."""
    q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
    qr, qi, qj, qk = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qj**2 + qk**2)
    r01 = 2 * (qj * qi - qk * qr)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qj * qi + qk * qr)
    r11 = 1 - 2 * (qi**2 + qk**2)
    r12 = 2 * (qj * qk - qi * qr)
    r20 = 2 * (qk * qi - qj * qr)
    r21 = 2 * (qj * qk + qi * qr)
    r22 = 1 - 2 * (qi**2 + qj**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [B,3,3] -> quaternions [B,4] (w,x,y,z)."""
    w = jnp.sqrt(jnp.clip(1.0 + R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2], 1e-12)) / 2.0
    x = (R[:, 2, 1] - R[:, 1, 2]) / (4 * w)
    y = (R[:, 0, 2] - R[:, 2, 0]) / (4 * w)
    z = (R[:, 1, 0] - R[:, 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)


def pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """Accept [B,4,4] pose matrices or [B,7] quaternion+translation; return [B,4,4]."""
    if pose.ndim == 2 and pose.shape[1] == 7:
        R = quat_to_rot(pose[:, :4])
        t = pose[:, 4:]
        B = pose.shape[0]
        mat = jnp.tile(jnp.eye(4, dtype=pose.dtype)[None], (B, 1, 1))
        mat = mat.at[:, :3, :3].set(R)
        mat = mat.at[:, :3, 3].set(t)
        return mat
    return pose


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """uv [B,S,2] pixel coords + pose [B,4,4]|[B,7] + K [B,4,4] -> (ray_dirs [B,S,3], cam_loc [B,3])."""
    p = pose_to_matrix(pose)
    cam_loc = p[:, :3, 3]

    batch_size, num_samples, _ = uv.shape
    depth = jnp.ones((batch_size, num_samples), dtype=uv.dtype)
    pixel_points_cam = lift(uv[:, :, 0], uv[:, :, 1], depth, intrinsics)  # [B,S,4]

    world_coords = jnp.einsum("bij,bsj->bsi", p, pixel_points_cam)[:, :, :3]
    ray_dirs = world_coords - cam_loc[:, None, :]
    ray_dirs = ray_dirs / (jnp.linalg.norm(ray_dirs, axis=2, keepdims=True) + 1e-12)
    return ray_dirs, cam_loc


def get_sphere_intersection(cam_loc: jnp.ndarray, ray_directions: jnp.ndarray, r: float = 1.0):
    """Near/far intersections of rays with the origin-centred sphere of radius r.

    cam_loc [B,3], ray_directions [B,S,3] ->
      sphere_intersections [B,S,2] (clamped to >= 0.01, 0 where no hit),
      mask_intersect [B,S] bool.
    Matches reference rend_util.py:200-221 (dense, no boolean gathers).
    """
    ray_cam_dot = jnp.einsum("bsj,bj->bs", ray_directions, cam_loc)  # [B,S]
    under_sqrt = ray_cam_dot**2 - (
        jnp.sum(cam_loc**2, axis=-1, keepdims=True) - r**2
    )  # [B,S]
    mask_intersect = under_sqrt > 0

    sqrt_val = jnp.sqrt(jnp.where(mask_intersect, under_sqrt, 0.0))
    near = -sqrt_val - ray_cam_dot
    far = sqrt_val - ray_cam_dot
    sphere_intersections = jnp.stack([near, far], axis=-1)
    sphere_intersections = jnp.where(mask_intersect[..., None], sphere_intersections, 0.0)
    sphere_intersections = jnp.clip(sphere_intersections, 0.01)
    return sphere_intersections, mask_intersect


def _world_to_cam(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """World points [B,S,3] -> camera frame [B,S,3].

    Uses the analytic rigid inverse (R^T, -R^T t) rather than a matrix
    inverse: exact, cheaper, and avoids LU decomposition (unsupported for
    some dtypes on TPU).
    """
    p = pose_to_matrix(pose)
    R = p[:, :3, :3]
    t = p[:, :3, 3]
    return jnp.einsum("bji,bsj->bsi", R, points - t[:, None, :])


def get_depth(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Depth of world points [B,S,3] in camera frame given pose [B,4,4]|[B,7] -> [B,S,1]."""
    return _world_to_cam(points, pose)[:, :, 2:3]


def points2uv(points: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Project world points [B,S,3] into pixel coords [B,S,2] of the camera."""
    points_cam = _world_to_cam(points, pose)
    return project(points_cam[:, :, 0], points_cam[:, :, 1], points_cam[:, :, 2], intrinsics)


# ---------------------------------------------------------------------------
# Host-side (numpy) P-matrix factorisation — reference rend_util.py:31-88
# ---------------------------------------------------------------------------

def factorize(P: np.ndarray):
    """RQ-factorise a 3x4 camera matrix into K [3,3], R [3,3], t [3,1]."""
    P = np.array(P[:3, :4], dtype=np.float64)
    K, R = linalg.rq(P[:3, :3])

    neg_sign_cnt = int(K[0, 0] < 0) + int(K[1, 1] < 0) + int(K[2, 2] < 0)
    if neg_sign_cnt in (1, 3):
        K = -K
        R = -R

    fix = np.diag((1, 1, 1))
    if K[0, 0] < 0 and K[1, 1] < 0:
        fix = np.diag((-1, -1, 1))
    elif K[0, 0] < 0 and K[2, 2] < 0:
        fix = np.diag((-1, 1, -1))
    elif K[1, 1] < 0 and K[2, 2] < 0:
        fix = np.diag((1, -1, -1))
    K = K @ fix
    R = fix @ R

    scale = K[2, 2]
    K = K / scale
    P = P / scale
    if np.linalg.det(R) < 0.0:
        R = -R
        P = -P

    t = linalg.lstsq(K, P[:3, 3:4])[0]
    return K, R, t


def load_K_Rt_from_P(filename: str = None, P: np.ndarray = None):
    """Camera P-matrix (or file of one) -> (intrinsics [4,4], c2w pose [4,4])."""
    if P is None:
        lines = open(filename).read().splitlines()
        if len(lines) == 4:
            lines = lines[1:]
        toks = [[x[0], x[1], x[2], x[3]] for x in (ln.split(" ") for ln in lines)]
        P = np.asarray(toks).astype(np.float32).squeeze()

    K, R, t = factorize(P)
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)

    W2C = np.eye(4)
    W2C[:3, :4] = np.hstack((R, t))
    pose = np.linalg.inv(W2C).astype(np.float32)
    return intrinsics, pose
