"""Visualisation + surface export helpers.

Equivalent of the reference utils/plots.py:12-344: image-grid writers, depth
maps, and marching-cubes surface export (`get_surface_trace` /
`get_surface_high_res_mesh`). Surface extraction runs through the native
marching-tetrahedra runtime instead of skimage; meshes are written as
OBJ/PLY via utils.mesh_io instead of plotly HTML.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def image_grid(images, cols: int = 4) -> np.ndarray:
    """Stack [N,H,W,3] float images into a grid image."""
    images = [np.clip(np.asarray(im), 0, 1) for im in images]
    H, W = images[0].shape[:2]
    rows = -(-len(images) // cols)
    grid = np.ones((rows * H, cols * W, 3), np.float32)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = im
    return grid


def depth_map(points: np.ndarray, pose: np.ndarray, mask: np.ndarray,
              img_res: Tuple[int, int]) -> np.ndarray:
    """Normalised depth visualisation of surface points (reference :244-283)."""
    import jax.numpy as jnp

    from nefii_tpu.utils.camera import get_depth

    H, W = img_res
    depth = np.asarray(
        get_depth(jnp.asarray(points[None]), jnp.asarray(pose[None]))
    )[0, :, 0]
    depth = np.where(mask, depth, np.nan)
    lo, hi = np.nanmin(depth), np.nanmax(depth)
    norm = (depth - lo) / max(hi - lo, 1e-8)
    img = np.where(np.isnan(norm), 1.0, norm)
    return np.tile(img.reshape(H, W, 1), (1, 1, 3)).astype(np.float32)


def sdf_grid(sdf_fn: Callable, resolution: int = 100, bound: float = 1.0,
             chunk: int = 262_144) -> np.ndarray:
    """Evaluate an SDF closure on a dense [R,R,R] grid (host-chunked)."""
    import jax.numpy as jnp

    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    out = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), chunk):
        out[i : i + chunk] = np.asarray(sdf_fn(jnp.asarray(pts[i : i + chunk])))
    return out.reshape(resolution, resolution, resolution)


def get_surface_trace(
    sdf_fn: Callable,
    resolution: int = 100,
    bound: float = 1.0,
    level: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the SDF zero-surface -> (vertices [V,3], faces [F,3]).

    Reference :127-241 (marching cubes + trimesh); here native marching
    tetrahedra + vertex welding.
    """
    from nefii_tpu.native import marching_tetrahedra

    grid = sdf_grid(sdf_fn, resolution, bound)
    tris = marching_tetrahedra(grid, level)  # [T,3,3] in grid coords
    if len(tris) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    scale = 2.0 * bound / (resolution - 1)
    world = tris * scale - bound  # [T,3,3]

    # weld duplicate vertices
    flat = world.reshape(-1, 3)
    keys = np.round(flat / (scale * 1e-4)).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float64)
    np.add.at(verts, inverse, flat)
    counts = np.bincount(inverse, minlength=len(uniq))
    verts /= counts[:, None]
    faces = inverse.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return verts.astype(np.float32), faces[ok]


def export_surface(sdf_fn: Callable, path: str, resolution: int = 100,
                   bound: float = 1.0) -> None:
    from nefii_tpu.utils.mesh_io import save_mesh

    verts, faces = get_surface_trace(sdf_fn, resolution, bound)
    save_mesh(path, verts, faces)
