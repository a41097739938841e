"""Persistent XLA compile cache, keyed per machine.

XLA:CPU serializes AOT cache entries WITHOUT the host's CPU feature set in
the key. An entry written by a different machine (e.g. a CI/dryrun VM
sharing the same /tmp path convention, or a copied cache dir) deserializes
through a feature-mismatch fallback that can stall the loading process for
tens of seconds — long enough to blow the 30 s Gloo collective-init
deadline inside a `jax.distributed` CPU cluster (observed: the 2-process
real-trainer test failed with `Gloo context initialization failed:
DEADLINE_EXCEEDED` twice in a row with a foreign cache present and passed
the moment it was cleared; VERDICT r4 weak #7).

Folding a host-feature hash into the cache DIRECTORY name makes foreign
entries invisible instead of poisonous: every machine reads and writes only
the entries it compiled itself. The TPU path benefits too — entries
compiled against a different libtpu/CPU host never shadow this machine's.
"""

from __future__ import annotations

import hashlib
import os
import platform

DEFAULT_BASE = "/tmp/nefii_jax_cache"


def host_fingerprint() -> str:
    """Stable hash of the host features that key AOT executables.

    Uses the CPU model + ISA feature flags (what XLA:CPU codegen targets)
    plus the machine architecture. Anything unreadable degrades to the
    empty string — worst case two different machines share a dir, which is
    exactly today's behavior, never worse."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                if line.startswith(("model name", "flags", "Features",
                                    "CPU implementer", "CPU part")):
                    if line not in seen:
                        seen.add(line)
                        parts.append(line.strip())
    except OSError:
        pass
    h = hashlib.sha256("\n".join(parts).encode()).hexdigest()
    return h[:12]


def cache_dir(base: str = DEFAULT_BASE) -> str:
    """This machine's persistent compile-cache directory."""
    return f"{base}-{host_fingerprint()}"


def setup(jax_module=None, *, min_compile_secs: float = 2.0,
          base: str = DEFAULT_BASE) -> str:
    """Point jax at the per-machine persistent cache. Safe to call early
    and more than once; returns the directory used (or "" on failure)."""
    if jax_module is None:
        import jax as jax_module
    d = cache_dir(base)
    try:
        jax_module.config.update("jax_compilation_cache_dir", d)
        jax_module.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
    except Exception:
        return ""
    return d
