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


def _weld_triangles(tris: np.ndarray, cell: float) -> Tuple[np.ndarray, np.ndarray]:
    """Weld a triangle soup [T,3,3] into (vertices [V,3], faces [F,3]),
    merging vertices closer than ~1e-4 of a grid cell and dropping
    degenerate faces."""
    flat = tris.reshape(-1, 3)
    keys = np.round(flat / (cell * 1e-4)).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float64)
    np.add.at(verts, inverse, flat)
    counts = np.bincount(inverse, minlength=len(uniq))
    verts /= counts[:, None]
    faces = inverse.reshape(-1, 3).astype(np.int32)
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return verts.astype(np.float32), faces[ok]


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
    return _weld_triangles(world, scale)


def export_surface(sdf_fn: Callable, path: str, resolution: int = 100,
                   bound: float = 1.0) -> None:
    from nefii_tpu.utils.mesh_io import save_mesh

    verts, faces = get_surface_trace(sdf_fn, resolution, bound)
    save_mesh(path, verts, faces)


def _largest_component(verts: np.ndarray, faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the connected component with the largest surface area
    (reference :186-189: trimesh split + areas.argmax). Components over the
    face-shared vertex graph."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    rows = np.concatenate([faces[:, 0], faces[:, 1]])
    cols = np.concatenate([faces[:, 1], faces[:, 2]])
    adj = coo_matrix(
        (np.ones(len(rows), np.int8), (rows, cols)),
        shape=(len(verts), len(verts)),
    )
    _, labels = connected_components(adj, directed=False)
    roots = labels[faces[:, 0]]

    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    best = np.argmax(np.bincount(roots, weights=area))
    keep_faces = faces[roots == best]

    used = np.unique(keep_faces)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[keep_faces].astype(np.int32)


def get_surface_high_res_mesh(
    sdf_fn: Callable,
    resolution: int = 100,
    bound: float = 1.0,
    coarse_resolution: int = 100,
    n_surface_samples: int = 10_000,
    eps: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Two-stage coarse-to-fine surface export (reference utils/plots.py:
    169-241): a coarse `coarse_resolution`^3 pass locates the surface, the
    largest-area connected component is sampled into a point cloud, the
    cloud is PCA-aligned, and a dense `resolution`-per-shortest-axis grid
    over the aligned bounding box (+/- `eps` padding) is re-marched for the
    final high-res mesh in world coordinates.

    Replaces the reference's trimesh component-split / surface sampling with
    the native BVH runtime (nefii_tpu.native.MeshSDF) and its marching-cubes
    with the native marching tetrahedra. Returns (vertices [V,3],
    faces [F,3]); empty arrays when the SDF has no zero crossing.
    """
    from nefii_tpu.native import MeshSDF, marching_tetrahedra

    verts, faces = get_surface_trace(sdf_fn, coarse_resolution, bound)
    if len(faces) == 0:
        return verts, faces
    verts, faces = _largest_component(verts, faces)

    # area-weighted surface point cloud via the native sampler
    pc = MeshSDF(verts, faces).sample_surface(n_surface_samples, seed=0)[0]
    pc = pc.astype(np.float64)

    # PCA alignment (reference :193-200): rows of `vecs` are the principal
    # axes; flipped to a proper rotation when the eigenbasis reflects
    mean = pc.mean(0)
    cov = (pc - mean).T @ (pc - mean)
    _, eigvecs = np.linalg.eigh(cov)
    vecs = eigvecs.T
    if np.linalg.det(vecs) < 0:
        vecs = vecs[[0, 2, 1]]
    aligned = (pc - mean) @ vecs.T

    # aligned-space grid: shortest bbox axis gets `resolution` samples, the
    # others extend at the same spacing (reference get_grid, :257-288)
    lo = aligned.min(0) - eps
    hi = aligned.max(0) + eps
    shortest = int(np.argmin(hi - lo))
    axis_s = np.linspace(lo[shortest], hi[shortest], resolution)
    spacing = (axis_s[-1] - axis_s[0]) / (resolution - 1)
    axes = []
    for a in range(3):
        if a == shortest:
            axes.append(axis_s)
        else:
            axes.append(np.arange(lo[a], hi[a] + spacing, spacing))

    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    grid_aligned = np.stack([X, Y, Z], -1).reshape(-1, 3)
    grid_world = grid_aligned @ vecs + mean  # vecs.T @ p per point

    import jax.numpy as jnp

    z = np.empty(len(grid_world), np.float32)
    chunk = 262_144
    for i in range(0, len(grid_world), chunk):
        z[i : i + chunk] = np.asarray(
            sdf_fn(jnp.asarray(grid_world[i : i + chunk], jnp.float32))
        )
    if z.min() > 0 or z.max() < 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    grid = z.reshape(len(axes[0]), len(axes[1]), len(axes[2]))
    tris = marching_tetrahedra(grid, 0.0)  # grid-index coords
    if len(tris) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tris_aligned = tris * spacing + lo  # uniform spacing on every axis
    tris_world = tris_aligned @ vecs + mean
    return _weld_triangles(tris_world, spacing)


def export_surface_high_res(sdf_fn: Callable, path: str, resolution: int = 300,
                            bound: float = 1.0) -> None:
    from nefii_tpu.utils.mesh_io import save_mesh

    verts, faces = get_surface_high_res_mesh(sdf_fn, resolution, bound)
    save_mesh(path, verts, faces)
