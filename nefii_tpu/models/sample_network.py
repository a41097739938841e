"""Differentiable surface intersection (IDR eq. 3).

Reference: model/sample_network.py:4-24. Represents the ray/SDF intersection
as a differentiable function of the implicit geometry so pixel-loss gradients
flow into SDF parameters through the (non-differentiable) sphere-traced
intersection:

    x(theta) = c + t0 * v - v * (sdf(x0; theta) - sdf0) / <grad sdf, v>

`surface_sdf_values` and `surface_points_grad` carry stop_gradients applied
by the caller (mirroring the reference's detach boundaries — SURVEY.md §7.4
item 2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sample_network(
    surface_output: jnp.ndarray,       # [N,1] sdf(x0; theta) — differentiable
    surface_sdf_values: jnp.ndarray,   # [N,1] detached sdf values
    surface_points_grad: jnp.ndarray,  # [N,3] detached grad sdf at x0
    surface_dists: jnp.ndarray,        # [N,1] traced distance t0
    surface_cam_loc: jnp.ndarray,      # [N,3]
    surface_ray_dirs: jnp.ndarray,     # [N,3]
) -> jnp.ndarray:
    ray_dirs_0 = lax.stop_gradient(surface_ray_dirs)
    dot = jnp.sum(surface_points_grad * ray_dirs_0, axis=-1, keepdims=True)
    # numerical stability: avoid division by ~0 (reference :17)
    dot = jnp.where(jnp.abs(dot) < 1e-8, 1e-8, dot)

    dists_theta = surface_dists - (surface_output - surface_sdf_values) / dot
    return surface_cam_loc + dists_theta * surface_ray_dirs
