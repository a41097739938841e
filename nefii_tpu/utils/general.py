"""Ray-chunking and misc utilities.

Equivalent of the reference utils/general.py: `split_input` 2^level ray
chunking (:24-37), `merge_output` (:68-82), `scatter_list` rank slicing
(:100-107), `get_class` (:10-16 — re-exported from the config registry).
`batchlize_input` (DataParallel reshaping) is intentionally absent: the mesh
subsumes it (SURVEY.md §2.6).

TPU-native difference: chunks are FIXED-SIZE (last chunk padded) so every
chunk hits the same compiled executable; `chunked_forward` runs a Python loop
over chunks of a jitted/shard-mapped forward and stitches outputs host-side.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

from nefii_tpu.config.registry import get_class  # re-export  # noqa: F401


def mkdir_ifnotexists(directory: str) -> None:
    os.makedirs(directory, exist_ok=True)


def glob_imgs(path: str):
    from nefii_tpu.datasets.scene_dataset import glob_imgs as _g

    return _g(path)


def chunk_count(total_pixels: int, num_pixels_per_chunk: int) -> int:
    return -(-total_pixels // num_pixels_per_chunk)


def pixels_per_chunk(memory_capacity_level: int, num_rays: int, world_size: int = 1) -> int:
    """2^level rays in flight across the whole mesh (reference :24-37 +
    exp_runner.py:45-46), divided by rays-per-pixel."""
    rays = 2 ** memory_capacity_level
    n = max(rays // max(num_rays, 1), 1)
    return max(n // world_size * world_size, world_size)


def split_input(model_input: Dict[str, np.ndarray], total_pixels: int, n_pixels: int) -> List[Dict]:
    """Split the per-image input into fixed-size pixel chunks (padded)."""
    chunks = []
    n = chunk_count(total_pixels, n_pixels)
    for i in range(n):
        lo = i * n_pixels
        hi = min(lo + n_pixels, total_pixels)
        pad = n_pixels - (hi - lo)
        data = {}
        for k, v in model_input.items():
            if k in ("uv", "object_mask"):
                sl = v[:, lo:hi]
                if pad:
                    sl = np.concatenate([sl, sl[:, -1:].repeat(pad, axis=1)], axis=1)
                data[k] = sl
            else:
                data[k] = v
        data["__valid__"] = hi - lo
        chunks.append(data)
    return chunks


def merge_output(res: List[Dict[str, np.ndarray]], total_pixels: int) -> Dict[str, np.ndarray]:
    """Concatenate chunked outputs and drop the padding."""
    out: Dict[str, np.ndarray] = {}
    for k in res[0]:
        if k == "__valid__":
            continue
        parts = []
        for r in res:
            v = np.asarray(r[k])
            parts.append(v[: r["__valid__"]])
        out[k] = np.concatenate(parts, axis=0)[:total_pixels]
    return out


def chunked_forward(
    forward_fn: Callable[[Dict], Dict],
    model_input: Dict[str, np.ndarray],
    total_pixels: int,
    n_pixels: int,
) -> Dict[str, np.ndarray]:
    """Run a fixed-shape forward over pixel chunks and merge."""
    results = []
    for chunk in split_input(model_input, total_pixels, n_pixels):
        valid = chunk.pop("__valid__")
        out = forward_fn(chunk)
        out = {k: np.asarray(v) for k, v in out.items()}
        out["__valid__"] = valid
        results.append(out)
    return merge_output(results, total_pixels)


def scatter_list(data: Sequence[Any], rank: int, world_size: int) -> List[Any]:
    """Round-robin slice of a work list for one rank (reference :100-107)."""
    return [x for i, x in enumerate(data) if i % world_size == rank]
