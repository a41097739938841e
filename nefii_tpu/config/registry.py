"""Dynamic class resolution by dotted path (plugin registry).

Mirrors the reference's `utils/general.py:10-16` `get_class`, which lets conf
files inject dataset/model/loss classes by dotted path
(`train.dataset_class` etc., conf.conf:3-5). We additionally keep an explicit
registry so TPU-native class names can alias the reference's dotted paths —
a conf written for the reference resolves to our implementations unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

# Aliases: reference dotted path -> nefii_tpu dotted path.
_ALIASES: Dict[str, str] = {
    "datasets.scene_dataset.SceneDataset": "nefii_tpu.datasets.scene_dataset.SceneDataset",
    "datasets.sdf_dataset.SDFDataset": "nefii_tpu.datasets.sdf_dataset.SDFDataset",
    "model.implicit_differentiable_renderer.IDRNetwork": "nefii_tpu.models.idr.IDRNetwork",
    "model.loss.IDRLoss": "nefii_tpu.models.loss.IDRLoss",
}

_REGISTRY: Dict[str, Any] = {}


def register(name: str, obj: Any) -> Any:
    _REGISTRY[name] = obj
    return obj


def get_class(kls: str) -> Any:
    """Resolve a dotted path (or registered alias) to a class/function."""
    kls = _ALIASES.get(kls, kls)
    if kls in _REGISTRY:
        return _REGISTRY[kls]
    parts = kls.split(".")
    module_name, attr = ".".join(parts[:-1]), parts[-1]
    module = importlib.import_module(module_name)
    return getattr(module, attr)
