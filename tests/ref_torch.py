"""Import helpers for the PyTorch reference implementation at /root/reference.

The reference code (FuxiComputerVision/Nefii) needs pyhocon, skimage, kornia
and an imageio-freeimage download at import time; none of those are available
offline. This module stubs the unused imports, parses the reference confs with
nefii_tpu's own HOCON parser, and exposes the reference model modules so parity
tests can run the torch implementation head-to-head against the JAX one.

Used by tests/test_torch_parity.py (VERDICT round-1 item 2: demonstrate
numerical parity with /root/reference/code/model/*.py).
"""

from __future__ import annotations

import sys
import types
from collections.abc import Mapping

REF_CODE = "/root/reference/code"


def _stub_missing_modules() -> None:
    try:
        import imageio

        imageio.plugins.freeimage.download = lambda *a, **k: None
    except Exception:
        pass
    for name in ("skimage", "kornia"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    # The reference hardcodes .cuda() in its forward paths
    # (implicit_differentiable_renderer.py:369,400); run them on CPU.
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


def import_reference(*module_names: str):
    """Import reference modules (e.g. 'model.sg_render') with stubs in place.

    Returns the imported module(s); a single module if one name is given.
    """
    _stub_missing_modules()
    if REF_CODE not in sys.path:
        sys.path.insert(0, REF_CODE)
    mods = [__import__(n, fromlist=["_"]) for n in module_names]
    return mods[0] if len(mods) == 1 else mods


class ConfShim(dict):
    """pyhocon.ConfigTree facade over a nested plain dict.

    Supports the accessors the reference constructors use
    (implicit_differentiable_renderer.py:244-258): dotted-path get_int/
    get_float/get_bool/get_string/get_list with optional defaults,
    get_config, and Mapping semantics so `**conf.get_config(...)` works.
    """

    def _resolve(self, key: str, default=..., *args):
        # pyhocon allows get(key, default) — tolerate both call styles.
        if args:
            default = args[0]
        node = self
        for part in key.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                if default is ...:
                    raise KeyError(key)
                return default
        return node

    def get(self, key, default=None):
        v = self._resolve(key, default)
        return ConfShim(v) if isinstance(v, Mapping) else v

    def get_int(self, key, default=...):
        v = self._resolve(key, default)
        return v if v is default else int(v)

    def get_float(self, key, default=...):
        v = self._resolve(key, default)
        return v if v is default else float(v)

    def get_bool(self, key, default=...):
        v = self._resolve(key, default)
        return v if v is default else bool(v)

    def get_string(self, key, default=...):
        v = self._resolve(key, default)
        return v if v is default else str(v)

    def get_list(self, key, default=...):
        v = self._resolve(key, default)
        return v if v is default else list(v)

    def get_config(self, key, default=...):
        v = self._resolve(key, default)
        return ConfShim(v) if isinstance(v, Mapping) else v


def parse_reference_conf(path: str = REF_CODE + "/confs_sg/conf.conf") -> ConfShim:
    """Parse a reference HOCON conf into a ConfShim via nefii_tpu's parser."""
    sys.path.insert(0, "/root/repo") if "/root/repo" not in sys.path else None
    from nefii_tpu.config import ConfigFactory

    return ConfShim(ConfigFactory.parse_file(path).as_plain_dict())


def build_reference_idr(conf_path: str = REF_CODE + "/confs_sg/conf.conf"):
    """Instantiate the reference IDRNetwork on torch CPU from a conf file."""
    idr_mod = import_reference("model.implicit_differentiable_renderer")
    conf = parse_reference_conf(conf_path)
    model = idr_mod.IDRNetwork(conf.get_config("model"))
    model.eval()
    return model, conf
