"""NeRF-style positional encoding (reference: model/embedder.py:5-50).

Layout matches the reference exactly: [x, sin(2^0 x), cos(2^0 x),
sin(2^1 x), cos(2^1 x), ...] with log-spaced frequencies and the raw input
included — so feature indices line up for checkpoint surgery and parity
tests. Pure function of the input; jit/vmap/grad friendly.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


def get_embedder(multires: int, input_dims: int = 3) -> Tuple[Callable, int]:
    """Return (embed_fn, out_dim). embed_fn maps [..., input_dims] -> [..., out_dim]."""
    if multires <= 0:
        return (lambda x: x), input_dims

    freq_bands = np.asarray(2.0 ** np.linspace(0.0, multires - 1, multires), dtype=np.float32)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        parts = [x]
        for freq in freq_bands:
            parts.append(jnp.sin(x * freq))
            parts.append(jnp.cos(x * freq))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
