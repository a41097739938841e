"""PixelPairGenerator — cross-view pixel pairing for the view-diff loss.

TPU-native equivalent of the reference model/pixel_pair_generator.py:12-152:
ray-trace query pixels to 3D points, reproject them into a partner view,
check visibility by tracing *back* toward the partner camera, and
bilinear-fetch partner RGB/mask.

Pure function of (params, camera data, image tensors) — the source images are
passed in as arrays (the caller gathers them host-side from the dataset),
keeping this jittable with static shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nefii_tpu.utils.camera import get_camera_params, points2uv

stop_grad = jax.lax.stop_gradient


class PixelPairGenerator:
    """API-parity wrapper over `find_paired_pixel` (reference class
    pixel_pair_generator.py:12): holds the dataset + model and gathers the
    partner-view tensors host-side per call."""

    def __init__(self, dataset, model, params=None):
        self.dataset = dataset
        self.model = model
        self.params = params

    def find_paired_pixel(self, query_cam_data, source_cam_index, key=None, params=None):
        import numpy as np

        ds = self.dataset
        idx = [int(i) for i in np.asarray(source_cam_index)]
        return find_paired_pixel(
            self.model,
            params if params is not None else self.params,
            query_cam_data,
            jnp.asarray(np.stack([ds.intrinsics_all[i] for i in idx])),
            jnp.asarray(np.stack([ds.pose_all[i] for i in idx])),
            jnp.asarray(np.stack([ds.rgb_images[i] for i in idx])),
            jnp.asarray(np.stack([ds.object_masks[i] for i in idx])),
            tuple(ds.img_res),
            key if key is not None else jax.random.PRNGKey(0),
        )


def bilinear_fetch(source_uv: jnp.ndarray, source_img: jnp.ndarray, img_res: Tuple[int, int]):
    """Bilinear sample: uv [N,P,2] from flattened images [N,H*W,C] -> [N,P,C].

    Matches the reference's hand-rolled gather (pixel_pair_generator.py:105-152).
    """
    H, W = img_res
    u = source_uv[..., 0:1]
    v = source_uv[..., 1:2]
    u_left = jnp.floor(u)
    u_right = u_left + 1.0
    v_top = jnp.floor(v)
    v_bottom = v_top + 1.0

    def fetch(uu, vv):
        ui = jnp.clip(uu[..., 0].astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(vv[..., 0].astype(jnp.int32), 0, H - 1)
        flat = vi * W + ui  # [N,P]
        return jnp.take_along_axis(source_img, flat[..., None], axis=1)

    tl = fetch(u_left, v_top)
    tr = fetch(u_right, v_top)
    bl = fetch(u_left, v_bottom)
    br = fetch(u_right, v_bottom)

    w_left = (u_right - u) / jnp.clip(u_right - u_left, 1e-5)
    w_right = 1 - w_left
    top = w_left * tl + w_right * tr
    bottom = w_left * bl + w_right * br
    w_top = (v_bottom - v) / jnp.clip(v_bottom - v_top, 1e-5)
    return w_top * top + (1 - w_top) * bottom


def find_paired_pixel(
    model,
    params,
    query_cam_data: Dict[str, jnp.ndarray],
    source_intrinsics: jnp.ndarray,  # [N,4,4]
    source_pose: jnp.ndarray,        # [N,4,4]
    source_rgb: jnp.ndarray,         # [N,H*W,3]
    source_mask: jnp.ndarray,        # [N,H*W]
    img_res: Tuple[int, int],
    key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Project query pixels' surface points into the partner views."""
    query_intrinsics = query_cam_data["intrinsics"]
    query_pose = query_cam_data["pose"]
    query_uv = query_cam_data["uv"]
    query_mask = query_cam_data["object_mask"].reshape(-1)
    N, P, _ = query_uv.shape

    imp = model.implicit_network
    p_imp = params["implicit_network"]
    sdf_fn = lambda x: stop_grad(imp.sdf(p_imp, x))

    query_ray_dirs, query_cam_loc = get_camera_params(
        query_uv, query_pose, query_intrinsics
    )
    k1, k2 = jax.random.split(key)
    res = model.ray_tracer(sdf_fn, query_cam_loc, query_mask, query_ray_dirs, key=k1)
    points = stop_grad(res.points).reshape(N, P, 3)
    network_object_mask = res.object_mask

    source_uv = points2uv(points, source_pose, source_intrinsics)  # [N,P,2]

    # visibility: trace from the point back toward the source camera
    source_cam_loc = source_pose[:, :3, 3]
    source_ray_dirs = points - source_cam_loc[:, None, :]
    source_ray_dirs = source_ray_dirs / (
        jnp.linalg.norm(source_ray_dirs, axis=-1, keepdims=True) + 1e-12
    )
    point_exist_mask = network_object_mask & query_mask

    back = model.ray_tracer(
        sdf_fn,
        points.reshape(-1, 3),
        point_exist_mask,
        -source_ray_dirs.reshape(-1, 1, 3),
        key=k2,
    )
    pixel_visible = (~back.object_mask) & point_exist_mask

    H, W = img_res
    u_ok = (source_uv[..., 0] >= 0) & (source_uv[..., 0] < W)
    v_ok = (source_uv[..., 1] >= 0) & (source_uv[..., 1] < H)
    pixel_visible = pixel_visible.reshape(N, P) & u_ok & v_ok
    source_uv = jnp.stack(
        [
            jnp.clip(source_uv[..., 0], 0, W - 1),
            jnp.clip(source_uv[..., 1], 0, H - 1),
        ],
        axis=-1,
    )

    sampled_rgb = bilinear_fetch(source_uv, source_rgb, img_res)
    sampled_mask = bilinear_fetch(
        source_uv, source_mask[..., None].astype(jnp.float32), img_res
    )[..., 0] > 0.5

    return {
        "uv": source_uv,
        "pixel_visible": pixel_visible.reshape(-1),
        "gt_rgb": sampled_rgb,
        "object_mask": sampled_mask,
        "intrinsics": source_intrinsics,
        "pose": source_pose,
    }
