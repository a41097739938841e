"""Colormap/colorbar helpers (reference utils/vis_util.py:14-113)."""

from __future__ import annotations

import numpy as np


def colormap(values: np.ndarray, cmap: str = "jet",
             vmin: float = None, vmax: float = None) -> np.ndarray:
    """Map scalar [H,W] (or flat) values to RGB via matplotlib colormaps."""
    import matplotlib.cm

    v = np.asarray(values, np.float32)
    lo = np.nanmin(v) if vmin is None else vmin
    hi = np.nanmax(v) if vmax is None else vmax
    norm = np.clip((v - lo) / max(hi - lo, 1e-12), 0, 1)
    return np.asarray(matplotlib.cm.get_cmap(cmap)(norm))[..., :3].astype(np.float32)


def with_colorbar(img: np.ndarray, values: np.ndarray, cmap: str = "jet",
                  bar_width: int = 12) -> np.ndarray:
    """Append a vertical colorbar strip to an [H,W,3] image."""
    H = img.shape[0]
    ramp = np.linspace(1, 0, H, dtype=np.float32)[:, None].repeat(bar_width, 1)
    bar = colormap(ramp, cmap, vmin=0, vmax=1)
    return np.concatenate([img, np.ones((H, 2, 3), np.float32), bar], axis=1)
