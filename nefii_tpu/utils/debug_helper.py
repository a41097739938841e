"""Value/gradient watch registry (reference utils/debug_helper.py:9-77).

In a functional JAX pipeline there are no tensor hooks; instead
`watch_value` records summaries via `jax.debug.callback` (works inside jit),
off unless `set_debug(True)`. Gradient watching wraps a value in an
identity `jax.custom_vjp` whose backward pass reports the cotangent.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_DEBUG = False
_RECORDS: Dict[str, Any] = {}


def set_debug(state: bool) -> None:
    global _DEBUG
    _DEBUG = state


def get_records() -> Dict[str, Any]:
    return dict(_RECORDS)


def clear() -> None:
    _RECORDS.clear()


def _record(name, kind, mean, amax, has_nan):
    _RECORDS[f"{name}/{kind}"] = {
        "mean": float(mean), "absmax": float(amax), "has_nan": bool(has_nan)
    }
    if has_nan:
        print(f"[debug_helper] NaN detected in {kind} of {name!r}")


def watch_value(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Record value statistics (no-op unless debugging is on)."""
    if not _DEBUG:
        return x
    jax.debug.callback(
        _record, name, "value", jnp.mean(x), jnp.max(jnp.abs(x)),
        jnp.any(jnp.isnan(x)),
    )
    return x


def watch_gradient(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Identity whose backward pass records cotangent statistics."""
    if not _DEBUG:
        return x

    @jax.custom_vjp
    def ident(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        jax.debug.callback(
            _record, name, "grad", jnp.mean(g), jnp.max(jnp.abs(g)),
            jnp.any(jnp.isnan(g)),
        )
        return (g,)

    ident.defvjp(fwd, bwd)
    return ident(x)


# reference-spelling alias (debug_helper.py used "gradiant")
watch_gradiant = watch_gradient
