"""RenderingNetwork — the IDR radiance cache.

TPU-native equivalent of the reference RenderingNetwork
(model/implicit_differentiable_renderer.py:126-241): ReLU MLP mapping
(x, n, v, feature) -> RGB with positional encodings on view dirs and xyz,
plus the output-clipping modes (:228-241). The default NeFII config uses
clip_method='pow2' (confs_sg/conf.conf:82) — this net is the *teacher*
providing outgoing radiance at secondary-ray hit points.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nefii_tpu.models.embedder import get_embedder
from nefii_tpu.models.mlp import (
    apply_linear,
    kaiming_uniform_relu,
    to_weight_norm,
    torch_default_linear,
    xavier_uniform,
)


@dataclass(frozen=True)
class RenderingNetwork:
    feature_vector_size: int
    mode: str = "idr"
    d_in: int = 9
    d_out: int = 3
    dims: Tuple[int, ...] = (512,) * 4
    weight_norm: bool = True
    weight_init: bool = False
    multires_view: int = 0
    multires_xyz: int = 0
    normalize_output: bool = True
    clip_output: bool = False
    clip_method: str = "relu"

    def __post_init__(self):
        object.__setattr__(self, "dims", tuple(self.dims))

    def _layer_dims(self):
        dims = [self.d_in + self.feature_vector_size] + list(self.dims) + [self.d_out]
        embedview_fn, view_ch = get_embedder(self.multires_view, 3)
        embedxyz_fn, xyz_ch = get_embedder(self.multires_xyz, 3)
        if self.multires_view > 0:
            dims[0] += view_ch - 3
        if self.multires_xyz > 0:
            dims[0] += xyz_ch - 3
        return dims, embedview_fn, embedxyz_fn

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        dims, _, _ = self._layer_dims()
        num_layers = len(dims)
        layers = []
        for l in range(num_layers - 1):
            key, sub = jax.random.split(key)
            layer = torch_default_linear(sub, dims[l], dims[l + 1])
            if self.weight_init:
                key, kw = jax.random.split(key)
                if l < num_layers - 2:
                    layer = {
                        "w": kaiming_uniform_relu(kw, dims[l], dims[l + 1]),
                        "b": jnp.zeros((dims[l + 1],), jnp.float32),
                    }
                else:
                    # last layer: bias zero; weight per clip/normalise mode
                    # (reference :185-191); pow2 keeps the torch default weight.
                    if self.normalize_output:
                        w = xavier_uniform(kw, dims[l], dims[l + 1], gain=5.0 / 3.0)
                    elif self.clip_method == "relu":
                        w = kaiming_uniform_relu(kw, dims[l], dims[l + 1])
                    else:
                        w = layer["w"]
                    layer = {"w": w, "b": jnp.zeros((dims[l + 1],), jnp.float32)}
            if self.weight_norm:
                layer = to_weight_norm(layer)
            layers.append(layer)
        return {"layers": layers}

    def __call__(
        self,
        params: Dict[str, Any],
        points: jnp.ndarray,
        normals: jnp.ndarray,
        view_dirs: jnp.ndarray,
        feature_vectors: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        _, embedview_fn, embedxyz_fn = self._layer_dims()
        if self.multires_view > 0:
            view_dirs = embedview_fn(view_dirs)
        if self.multires_xyz > 0:
            points = embedxyz_fn(points)

        if self.mode == "idr":
            parts = [points, view_dirs, normals]
        elif self.mode == "no_view_dir":
            parts = [points, normals]
        elif self.mode == "no_normal":
            parts = [points, view_dirs]
        else:
            raise ValueError(f"unknown rendering mode {self.mode!r}")
        if feature_vectors is not None:
            parts.append(feature_vectors)
        x = jnp.concatenate(parts, axis=-1)

        layers = params["layers"]
        for l, layer in enumerate(layers):
            x = apply_linear(layer, x)
            if l < len(layers) - 1:
                x = jax.nn.relu(x)

        if self.normalize_output:
            return (jnp.tanh(x) + 1.0) / 2.0
        if not self.clip_output:
            return x
        if self.clip_method == "relu":
            return jax.nn.relu(x)
        if self.clip_method == "abs":
            return jnp.abs(x)
        if self.clip_method == "relu_init":
            return jax.nn.relu(x) + 0.5
        if self.clip_method == "pow2":
            return x**2
        raise ValueError(f"unknown clip_method {self.clip_method!r}")
