"""ImplicitNetwork — SDF + geometry feature MLP.

TPU-native equivalent of the reference's ImplicitNetwork
(model/implicit_differentiable_renderer.py:18-123): softplus(beta=100) MLP
with a skip connection, geometric initialisation (:62-76), weight norm
(:78-79), positional encoding, and `use_last_as_f` reusing the last hidden
layer as the appearance feature (:34-42, 92-106). Gradients come from
`jax.grad` instead of autograd double-backprop (:110-123) — second-order AD
through the network (needed by the eikonal loss) falls out for free.

Pure functions: the class only holds static config; params are an explicit
pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.embedder import get_embedder
from nefii_tpu.models.mlp import apply_linear, softplus_beta, to_weight_norm


@dataclass(frozen=True)
class ImplicitNetwork:
    feature_vector_size: int
    d_in: int = 3
    d_out: int = 1
    dims: Tuple[int, ...] = (512,) * 8
    geometric_init: bool = True
    bias: float = 1.0
    skip_in: Tuple[int, ...] = ()
    weight_norm: bool = True
    multires: int = 0
    use_last_as_f: bool = False

    def __post_init__(self):
        if self.use_last_as_f:
            assert self.feature_vector_size == self.dims[-1]
        object.__setattr__(self, "dims", tuple(self.dims))
        object.__setattr__(self, "skip_in", tuple(self.skip_in))

    # ---- static layer geometry ------------------------------------------
    def _layer_dims(self):
        if not self.use_last_as_f:
            dims = [self.d_in] + list(self.dims) + [self.d_out + self.feature_vector_size]
        else:
            dims = [self.d_in] + list(self.dims) + [self.d_out]
        embed_fn, input_ch = get_embedder(self.multires, self.d_in)
        if self.multires > 0:
            dims[0] = input_ch
        return dims, embed_fn

    @property
    def num_layers(self) -> int:
        dims, _ = self._layer_dims()
        return len(dims)

    # ---- init ------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        dims, _ = self._layer_dims()
        num_layers = len(dims)
        layers = []
        for l in range(num_layers - 1):
            key, sub = jax.random.split(key)
            out_dim = dims[l + 1] - dims[0] if (l + 1) in self.skip_in else dims[l + 1]
            in_dim = dims[l]

            if self.geometric_init:
                if l == num_layers - 2:
                    w = np.sqrt(np.pi) / np.sqrt(dims[l]) + 1e-4 * jax.random.normal(
                        sub, (out_dim, in_dim), jnp.float32
                    )
                    b = jnp.full((out_dim,), -self.bias, jnp.float32)
                elif self.multires > 0 and l == 0:
                    w = jnp.zeros((out_dim, in_dim), jnp.float32)
                    w = w.at[:, : self.d_in].set(
                        np.sqrt(2.0 / out_dim)
                        * jax.random.normal(sub, (out_dim, self.d_in), jnp.float32)
                    )
                    b = jnp.zeros((out_dim,), jnp.float32)
                elif self.multires > 0 and l in self.skip_in:
                    w = np.sqrt(2.0 / out_dim) * jax.random.normal(
                        sub, (out_dim, in_dim), jnp.float32
                    )
                    w = w.at[:, -(dims[0] - self.d_in):].set(0.0)
                    b = jnp.zeros((out_dim,), jnp.float32)
                else:
                    w = np.sqrt(2.0 / out_dim) * jax.random.normal(
                        sub, (out_dim, in_dim), jnp.float32
                    )
                    b = jnp.zeros((out_dim,), jnp.float32)
                layer = {"w": w, "b": b}
            else:
                from nefii_tpu.models.mlp import torch_default_linear

                layer = torch_default_linear(sub, in_dim, out_dim)

            if self.weight_norm:
                layer = to_weight_norm(layer)
            layers.append(layer)
        return {"layers": layers}

    # ---- forward -----------------------------------------------------------
    def __call__(self, params: Dict[str, Any], pts: jnp.ndarray) -> jnp.ndarray:
        """pts [..., 3] -> [..., d_out + feature_vector_size] (sdf first)."""
        dims, embed_fn = self._layer_dims()
        num_layers = len(dims)

        inp = embed_fn(pts) if self.multires > 0 else pts
        x = inp
        feature = None
        for l in range(num_layers - 1):
            if self.use_last_as_f and l == num_layers - 2:
                feature = x
            if l in self.skip_in:
                x = jnp.concatenate([x, inp], axis=-1) / np.sqrt(2.0)
            x = apply_linear(params["layers"][l], x)
            if l < num_layers - 2:
                x = softplus_beta(x, 100.0)
        if self.use_last_as_f:
            x = jnp.concatenate([x, feature], axis=-1)
        return x

    def sdf(self, params: Dict[str, Any], pts: jnp.ndarray) -> jnp.ndarray:
        """pts [..., 3] -> sdf [...]."""
        return self(params, pts)[..., 0]

    def gradient(self, params: Dict[str, Any], pts: jnp.ndarray) -> jnp.ndarray:
        """Per-point spatial gradient of the SDF: pts [..., 3] -> [..., 3].

        Points are independent, so grad-of-sum equals the per-point gradient;
        this keeps a single batched MXU-friendly MLP evaluation in the
        backward pass instead of a vmapped per-point VJP.
        """
        return jax.grad(lambda p: self.sdf(params, p).sum())(pts)

    def sdf_and_feature(self, params: Dict[str, Any], pts: jnp.ndarray):
        out = self(params, pts)
        return out[..., 0], out[..., 1:]

    def sdf_feature_grad(self, params: Dict[str, Any], pts: jnp.ndarray):
        """(sdf [...], feature [...,F], grad [...,3]) in ONE forward+backward.

        The shading path needs all three at the same points (reference
        :529-540 runs the net twice plus a double-backprop); value_and_grad
        with aux shares the forward, saving a full MLP evaluation per
        shading call on the hot path.
        """

        def f(p):
            out = self(params, p)
            return out[..., 0].sum(), out

        grad, out = jax.grad(f, has_aux=True)(pts)
        return out[..., 0], out[..., 1:], grad
