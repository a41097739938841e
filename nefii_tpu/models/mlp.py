"""Linear-layer primitives: initialisers + explicit weight normalisation.

JAX has no parametrisation hooks, so the reference's
`nn.utils.weight_norm(lin)` (implicit_differentiable_renderer.py:78-79)
becomes an explicit reparametrisation  w = g * v / ||v||  with `v` [out,in]
and `g` [out,1] stored as leaves of the param pytree. Initialisers replicate
torch semantics so that geometry/appearance statistics at init match the
reference.

All params are fp32; matmuls take `preferred_element_type` so XLA targets the
MXU with full-precision accumulation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def torch_default_linear(key: jax.Array, d_in: int, d_out: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(kw, (d_out, d_in), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def kaiming_uniform_relu(key: jax.Array, d_in: int, d_out: int) -> jnp.ndarray:
    """torch kaiming_uniform_(mode='fan_in', nonlinearity='relu'): U(+-sqrt(6/d_in))."""
    bound = np.sqrt(6.0 / d_in)
    return jax.random.uniform(key, (d_out, d_in), jnp.float32, -bound, bound)


def xavier_uniform(key: jax.Array, d_in: int, d_out: int, gain: float = 1.0) -> jnp.ndarray:
    bound = gain * np.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_out, d_in), jnp.float32, -bound, bound)


def to_weight_norm(layer: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Reparametrise a plain {'w','b'} layer as weight-normed {'v','g','b'}.

    Matches torch weight_norm(dim=0): g initialised to the per-output-row L2
    norm of w, so the initial effective weight is identical.
    """
    w = layer["w"]
    g = jnp.linalg.norm(w, axis=1, keepdims=True)  # [out, 1]
    return {"v": w, "g": g, "b": layer["b"]}


def effective_weight(layer: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if "v" in layer:
        v = layer["v"]
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        return layer["g"] * v / (norm + 1e-12)
    return layer["w"]


def apply_linear(layer: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w.T + b with fp32 MXU accumulation."""
    w = effective_weight(layer)
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + layer["b"]


def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch nn.Softplus(beta): (1/beta) * log(1 + exp(beta x)), stable form."""
    return jax.nn.softplus(beta * x) / beta
