"""SceneDataset — posed multi-view images + masks + cameras.

TPU-native equivalent of the reference datasets/scene_dataset.py:25-279.
Host-side numpy only (device transfer happens in the trainer); differences by
design:
  * randomness is an explicit np.random.Generator (seeded per epoch by the
    trainer) instead of global torch RNG — this is what makes the
    rank-scattered pixel sampling reproducible across hosts;
  * images are loaded through the in-repo EXR codec / imageio (no freeimage
    binary download);
  * samples are plain numpy dicts; `collate` stacks them for a batch.

Feature parity: inverse-gamma on load (:69-79), maskless mode (:90-99),
`subsample` resize of images+intrinsics (:105-136), per-epoch pixel
subsampling (:218-222), patch sampling (:224-251), multi-ray jitter
(:179-193, 212-216), DDP pixel scatter (:260-279), camera-pose quaternion
init (:253-258), single-image pinning (:141-147).
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np

from nefii_tpu.utils import exr as exr_io
from nefii_tpu.utils.camera import rot_to_quat

IMG_EXTENSIONS = ["png", "jpg", "jpeg", "JPG", "JPEG", "exr", "PNG", "EXR"]


def glob_imgs(path: str) -> List[str]:
    imgs: List[str] = []
    for ext in IMG_EXTENSIONS:
        imgs.extend(glob(os.path.join(path, f"*.{ext}")))
    return sorted(set(imgs))


def load_rgb(path: str) -> np.ndarray:
    """Load an image as float32 [H,W,3]; LDR images scaled to [0,1]."""
    if path.lower().endswith(".exr"):
        img = exr_io.read(path)[:, :, :3]
    else:
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path), np.float32)[:, :, :3] / 255.0
    return np.asarray(img, np.float32)


def load_mask(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    alpha = np.asarray(imageio.imread(path), np.float32)
    if alpha.ndim == 3:
        alpha = alpha.mean(-1)
    return (alpha / 255.0) > 0.5


def read_cam_dict(cam_dict_file: str) -> Dict:
    with open(cam_dict_file) as fp:
        cam_dict = json.load(fp)
    for x in sorted(cam_dict.keys()):
        K = np.array(cam_dict[x]["K"]).reshape(4, 4)
        W2C = np.array(cam_dict[x]["W2C"]).reshape(4, 4)
        cam_dict[x]["K"] = K
        cam_dict[x]["W2C"] = W2C
        cam_dict[x]["C2W"] = np.linalg.inv(W2C)
    return cam_dict


class SceneDataset:
    def __init__(
        self,
        gamma: float,
        instance_dir: str,
        train_cameras: bool,
        subsample: float = 1,
        wo_mask: bool = False,
    ):
        assert os.path.exists(instance_dir), f"Data directory is empty: {instance_dir}"
        self.instance_dir = instance_dir
        self.gamma = gamma
        self.train_cameras = train_cameras
        self.subsample = subsample

        image_paths = glob_imgs(os.path.join(instance_dir, "image"))
        mask_paths = glob_imgs(os.path.join(instance_dir, "mask"))
        cam_dict = read_cam_dict(os.path.join(instance_dir, "cam_dict_norm.json"))
        self.n_cameras = len(cam_dict) if not image_paths else len(image_paths)
        self.image_paths = image_paths

        self.single_imgname: Optional[str] = None
        self.single_imgname_idx: Optional[int] = None
        self.sampling_idx: Optional[np.ndarray] = None
        self.sampling_rays: Optional[np.ndarray] = None

        self.intrinsics_all = []
        self.pose_all = []
        for x in sorted(cam_dict.keys()):
            self.intrinsics_all.append(cam_dict[x]["K"].astype(np.float32))
            self.pose_all.append(cam_dict[x]["C2W"].astype(np.float32))

        if image_paths:
            self.has_groundtruth = True
            self.rgb_images = []
            for path in image_paths:
                rgb = load_rgb(path) ** self.gamma  # inverse gamma
                H, W = rgb.shape[:2]
                self.img_res = [H, W]
                self.total_pixels = H * W
                self.rgb_images.append(rgb.reshape(-1, 3))
        else:
            self.has_groundtruth = False
            K = self.intrinsics_all[0]
            W = int(2.0 / K[0, 0])
            H = int(2.0 / K[1, 1])
            self.img_res = [H, W]
            self.total_pixels = H * W
            self.rgb_images = [
                np.ones((self.total_pixels, 3), np.float32)
            ] * self.n_cameras

        if mask_paths and not wo_mask:
            assert len(mask_paths) == self.n_cameras
            self.object_masks = [load_mask(p).reshape(-1) for p in mask_paths]
        else:
            self.object_masks = [
                np.ones((self.total_pixels,), bool)
            ] * self.n_cameras

        if self.subsample is not None and self.subsample != 1:
            self.resize()

    # ------------------------------------------------------------------
    def resize(self) -> None:
        import cv2

        old_res = (self.img_res[0], self.img_res[1])
        new_res = (int(old_res[0] * self.subsample), int(old_res[1] * self.subsample))
        self.img_res = [new_res[0], new_res[1]]
        self.total_pixels = new_res[0] * new_res[1]
        scale = max(new_res) / max(old_res)

        for K in self.intrinsics_all:
            K[0, 0] *= scale
            K[0, 2] *= scale
            K[1, 1] *= scale
            K[1, 2] *= scale

        interp = cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR
        for i in range(len(self.rgb_images)):
            img = self.rgb_images[i].reshape(old_res[0], old_res[1], 3)
            img = cv2.resize(img, (new_res[1], new_res[0]), interpolation=interp)
            self.rgb_images[i] = img.reshape(-1, 3).astype(np.float32)
        for i in range(len(self.object_masks)):
            m = self.object_masks[i].reshape(old_res[0], old_res[1]).astype(np.float32)
            m = cv2.resize(m, (new_res[1], new_res[0]), interpolation=interp)
            self.object_masks[i] = (m > 0.5).reshape(-1)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.n_cameras

    def return_single_img(self, img_name: str) -> None:
        self.single_imgname = img_name
        for idx, p in enumerate(self.image_paths):
            if os.path.basename(p) == img_name:
                self.single_imgname_idx = idx
                break

    def _full_uv(self) -> np.ndarray:
        H, W = self.img_res
        v, u = np.mgrid[0:H, 0:W].astype(np.float32)
        return np.stack([u, v], -1).reshape(-1, 2)  # x (col) first, like the ref

    def __getitem__(self, idx: int):
        if self.single_imgname_idx is not None:
            idx = self.single_imgname_idx

        uv = self._full_uv()
        sample = {
            "object_mask": self.object_masks[idx],
            "uv": uv,
            "intrinsics": self.intrinsics_all[idx],
        }
        ground_truth = {"rgb": self.rgb_images[idx]}

        if self.sampling_idx is not None:
            ground_truth["rgb"] = self.rgb_images[idx][self.sampling_idx, :]
            sample["object_mask"] = self.object_masks[idx][self.sampling_idx]
            sample["uv"] = uv[self.sampling_idx, :]

        sample["uv"] = self.ray_sample(sample["uv"])

        if not self.train_cameras:
            sample["pose"] = self.pose_all[idx]
        return idx, sample, ground_truth

    # ------------------------------------------------------------------
    def ray_sample(self, s_uv: np.ndarray) -> np.ndarray:
        """Add the per-epoch multi-ray jitter offsets: [S,2] -> [S,R,2]."""
        if self.sampling_rays is None:
            return s_uv
        return s_uv[:, None, :] + self.sampling_rays[None, :, :]

    def batch_ray_sample(self, s_uv_batch: np.ndarray) -> np.ndarray:
        B, S, _ = s_uv_batch.shape
        out = self.ray_sample(s_uv_batch.reshape(B * S, 2))
        return out.reshape(B, S, -1, 2)

    @staticmethod
    def collate(batch_list):
        """Stack a list of (idx, sample, gt) into batch arrays (:195-210)."""
        idxs, samples, gts = zip(*batch_list)
        out_s = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        out_g = {k: np.stack([g[k] for g in gts]) for k in gts[0]}
        return np.asarray(idxs, np.int64), out_s, out_g

    # ------------------------------------------------------------------
    def change_sampling_rays(self, sampling_size: int, rng: Optional[np.random.Generator] = None):
        if sampling_size == -1:
            self.sampling_rays = None
        else:
            rng = rng or np.random.default_rng()
            self.sampling_rays = (
                rng.random((sampling_size, 2)).astype(np.float32) - 0.5
            )

    def change_sampling_idx(self, sampling_size: int, rng: Optional[np.random.Generator] = None):
        if sampling_size == -1:
            self.sampling_idx = None
        else:
            rng = rng or np.random.default_rng()
            self.sampling_idx = rng.permutation(self.total_pixels)[:sampling_size]

    def change_sampling_idx_patch(self, N_patch: int, r_patch: int = 1,
                                  rng: Optional[np.random.Generator] = None):
        if N_patch == -1:
            self.sampling_idx = None
            return
        rng = rng or np.random.default_rng()
        H, W = self.img_res
        u, v = np.meshgrid(np.arange(-r_patch, r_patch), np.arange(-r_patch, r_patch))
        offsets = (v.reshape(-1) * W + u.reshape(-1))
        u, v = np.meshgrid(np.arange(r_patch, W - r_patch), np.arange(r_patch, H - r_patch))
        u, v = u.reshape(-1), v.reshape(-1)
        sel = rng.choice(u.shape[0], size=(N_patch,), replace=False)
        centers = v[sel] * W + u[sel]
        inds = np.stack([centers + s for s in offsets], axis=1).reshape(-1)
        self.sampling_idx = inds

    # ------------------------------------------------------------------
    def get_pose_init(self) -> np.ndarray:
        """Quaternion+translation init for pose optimisation (:253-258)."""
        import jax.numpy as jnp

        poses = np.stack(self.pose_all)  # [N,4,4]
        quat = np.asarray(rot_to_quat(jnp.asarray(poses[:, :3, :3])))
        return np.concatenate([quat, poses[:, :3, 3]], axis=1).astype(np.float32)

    # ------------------------------------------------------------------
    def scatter_sampling_idx(self, rank: int, world_size: int):
        """Slice the shared pixel sample among data-parallel ranks (:260-266)."""
        if self.sampling_idx is None:
            return
        sub = self.sampling_idx.shape[0] // world_size
        if rank < world_size - 1:
            self.sampling_idx = self.sampling_idx[rank * sub : (rank + 1) * sub]
        else:
            self.sampling_idx = self.sampling_idx[rank * sub :]

    def scatter_sampling_idx_patch(self, rank: int, world_size: int, N_patch: int, r_patch: int = 1):
        if self.sampling_idx is None:
            return
        plen = 4 * r_patch * r_patch
        inds = self.sampling_idx.reshape(-1, plen)
        sub = inds.shape[0] // world_size
        if rank < world_size - 1:
            inds = inds[rank * sub : (rank + 1) * sub]
        else:
            inds = inds[rank * sub :]
        self.sampling_idx = inds.reshape(-1)
