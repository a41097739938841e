"""Pure-JAX LPIPS (AlexNet variant) for offline evaluation.

The reference evaluates LPIPS-alex via the `lpips` torch package
(reference scripts/evaluate.py:116,154), whose pretrained weights are
downloaded at first use — impossible in an offline deployment. This module
re-implements the LPIPS forward (Zhang et al., CVPR 2018: unit-normalized
AlexNet features, squared difference, learned 1x1 per-layer weights,
spatial average, layer sum) in JAX, loading weights the USER supplies:

  * a torch checkpoint of the full `lpips.LPIPS(net="alex")` module
    (state dict with `net.slice*` + `lin*.model.1.weight` keys),
  * a directory holding a torchvision `alexnet` state dict
    (`features.*` keys) plus the lpips linear-head file
    (`lin*.model.1.weight` keys, the package's `weights/v0.1/alex.pth`),
  * or an `.npz` with the canonical keys produced by `save_npz`.

Compute runs through `jax.lax.conv_general_dilated` / `reduce_window`, so
the metric itself executes on the accelerator. Numeric semantics
(conv/pool/normalize) are pinned against torch.nn.functional in
tests/test_tools.py with random weights.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# Torchvision AlexNet feature stack (conv params: out_ch, kernel, stride, pad)
# with ReLU after every conv; 3x3/2 max-pools after conv1 and conv2. LPIPS
# taps the five post-ReLU feature maps.
_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # max-pool follows conv index 0 and 1
# lpips.ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)
# torchvision layer indices of the convs inside `features`, used both by
# `features.{i}.weight` checkpoints and lpips `net.slice{k}.{i}.weight` keys
_TV_IDX = (0, 3, 6, 8, 10)


def _canon_from_torch_state(state) -> Dict[str, np.ndarray]:
    """Accepts a full-LPIPS, torchvision-alexnet, or lins-only state dict
    (torch tensors or arrays); returns whatever canonical entries it holds."""
    out: Dict[str, np.ndarray] = {}

    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "cpu") else v, np.float32)

    for k, v in state.items():
        base = k.split("module.", 1)[-1]
        for ci, tv in enumerate(_TV_IDX):
            for attr in ("weight", "bias"):
                if base.endswith(f"slice{ci + 1}.{tv}.{attr}") or \
                        base == f"features.{tv}.{attr}":
                    out[f"conv{ci}_{attr[0]}"] = to_np(v)
        for li in range(5):
            if base == f"lin{li}.model.1.weight" or \
                    base.endswith(f"lins.{li}.model.1.weight"):
                out[f"lin{li}"] = to_np(v).reshape(-1)
    return out


def _missing_keys(canon: Dict[str, np.ndarray]) -> list:
    return [k for k in
            [f"conv{i}_{a}" for i in range(5) for a in "wb"]
            + [f"lin{i}" for i in range(5)]
            if k not in canon]


def load_weights(path: str) -> Dict[str, np.ndarray]:
    """Load LPIPS-alex weights from `path` (see module docstring)."""
    canon = _collect_partial(path)
    missing = _missing_keys(canon)
    if missing:
        raise ValueError(
            f"LPIPS weights at {path!r} are incomplete: missing {missing}. "
            "Provide a full lpips.LPIPS state dict, or a directory with a "
            "torchvision alexnet state dict plus the lpips lin-head file."
        )
    for i, (c_out, k, _, _) in enumerate(_CONVS):
        w = canon[f"conv{i}_w"]
        if w.shape[0] != c_out or w.shape[-1] != k:
            raise ValueError(
                f"conv{i} weight shape {w.shape} does not match AlexNet "
                f"({c_out} out-channels, {k}x{k} kernel)"
            )
    return canon


def save_npz(weights: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **weights)


def _features(weights, x):
    """x: [N,3,H,W] in [-1,1] → list of 5 post-ReLU feature maps."""
    import jax.numpy as jnp
    from jax import lax

    x = (x - jnp.asarray(_SHIFT)[:, None, None]) / \
        jnp.asarray(_SCALE)[:, None, None]
    feats = []
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        w = jnp.asarray(weights[f"conv{i}_w"])
        b = jnp.asarray(weights[f"conv{i}_b"])
        x = lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jnp.maximum(x, 0.0)
        feats.append(x)
        if i in _POOL_AFTER:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID",
            )
    return feats


def _lpips_fwd(weights, a, b):
    import jax.numpy as jnp

    fa, fb = _features(weights, a), _features(weights, b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        nx = x * (jnp.sum(x * x, 1, keepdims=True) ** 0.5 + 1e-10) ** -1
        ny = y * (jnp.sum(y * y, 1, keepdims=True) ** 0.5 + 1e-10) ** -1
        d = (nx - ny) ** 2
        lin = jnp.asarray(weights[f"lin{i}"])
        total = total + jnp.mean(
            jnp.sum(d * lin[None, :, None, None], axis=1), axis=(-2, -1)
        )
    return total


_JIT = None


def lpips_distance(weights: Dict[str, np.ndarray], pred: np.ndarray,
                   gt: np.ndarray) -> float:
    """LPIPS-alex distance between HWC float images in [0, 1]."""
    global _JIT
    import jax
    import jax.numpy as jnp

    if _JIT is None:
        # weights ride as a pytree argument, so one compile per image shape
        # serves every weight set
        _JIT = jax.jit(_lpips_fwd)
    a = jnp.moveaxis(jnp.asarray(pred, jnp.float32), -1, 0)[None] * 2 - 1
    b = jnp.moveaxis(jnp.asarray(gt, jnp.float32), -1, 0)[None] * 2 - 1
    return float(_JIT(weights, a, b)[0])


_CACHE: Dict[str, Dict[str, np.ndarray]] = {}


def lpips_from_path(pred: np.ndarray, gt: np.ndarray,
                    weights_path: Optional[str]) -> float:
    wp = weights_path or os.environ.get("NEFII_LPIPS_WEIGHTS")
    if not wp:
        raise FileNotFoundError("no LPIPS weights path given")
    if wp not in _CACHE:
        try:
            _CACHE[wp] = load_weights(wp)
        except FileNotFoundError as e:
            # distinguish a USER-SUPPLIED bad path from the no-path sentinel
            # above — callers treat FileNotFoundError as "no weights given"
            # and would otherwise tell the user to set the path they set
            raise RuntimeError(f"LPIPS weights path not found: {wp}") from e
        except Exception as e:
            # only LOAD failures earn the weights-failed label; a later
            # compute failure (bad image shape, lowering error) must not
            # send the user to debug a weights path that loaded fine
            raise RuntimeError(f"LPIPS weights failed to load: {e}") from e
    try:
        return lpips_distance(_CACHE[wp], pred, gt)
    except Exception as e:
        raise RuntimeError(f"LPIPS computation failed: {e}") from e


def _export_main(argv) -> int:
    """One-command weights export for users WITH egress (this deployment has
    none — reference scripts/evaluate.py:116,154 downloads at first use):

        python -m nefii_tpu.utils.lpips_jax --export-from-torch out.npz
        python -m nefii_tpu.utils.lpips_jax --export-from-torch out.npz SRC...

    With no SRC, instantiates `lpips.LPIPS(net='alex')` (the reference's
    evaluator model; the pip package downloads its weights on first use) and
    exports its state dict. With SRC paths (.pth/.pt/.npz files or a
    directory), converts those instead — e.g. a torchvision alexnet state
    dict plus the lpips repo's `weights/v0.1/alex.pth` lin heads. Afterwards
    point evaluate.py at the npz via --lpips_weights or NEFII_LPIPS_WEIGHTS.
    """
    import argparse

    ap = argparse.ArgumentParser(prog="nefii_tpu.utils.lpips_jax")
    ap.add_argument("--export-from-torch", metavar="OUT_NPZ", required=True)
    ap.add_argument("sources", nargs="*",
                    help=".pth/.pt/.npz file(s) or a directory; default: "
                         "the installed `lpips` package (needs egress on "
                         "first use)")
    ns = ap.parse_args(argv)

    if ns.sources:
        canon: Dict[str, np.ndarray] = {}
        for src in ns.sources:
            canon.update(_collect_partial(src))
        weights = _finalize(canon)
    else:
        try:
            import lpips  # type: ignore
        except ImportError:
            print("error: the `lpips` package is not installed and no "
                  "source paths were given.\n  pip install lpips   # then "
                  "re-run (downloads AlexNet + lin weights on first use)")
            return 2
        model = lpips.LPIPS(net="alex")
        weights = _finalize(_canon_from_torch_state(model.state_dict()))

    save_npz(weights, ns.export_from_torch)
    # prove the export is loadable through the same gate evaluate.py uses
    load_weights(ns.export_from_torch)
    print(f"wrote {ns.export_from_torch} "
          f"({sum(v.size for v in weights.values())} params, verified "
          "loadable). Use: evaluate.py --lpips_weights "
          f"{ns.export_from_torch}  (or NEFII_LPIPS_WEIGHTS=...)")
    return 0


def _collect_partial(path: str) -> Dict[str, np.ndarray]:
    """load_weights minus the completeness check, so several partial sources
    (backbone + lin heads) can be merged before finalizing."""
    canon: Dict[str, np.ndarray] = {}
    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith((".pth", ".pt", ".npz"))]
             if os.path.isdir(path) else [path])
    for f in files:
        if f.endswith(".npz"):
            canon.update({k: np.asarray(v, np.float32)
                          for k, v in np.load(f).items()})
        else:
            import torch

            state = torch.load(f, map_location="cpu", weights_only=True)
            if hasattr(state, "state_dict"):
                state = state.state_dict()
            canon.update(_canon_from_torch_state(state))
    return canon


def _finalize(canon: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    missing = _missing_keys(canon)
    if missing:
        raise SystemExit(f"export incomplete: missing {missing} — supply a "
                         "full lpips.LPIPS state dict, or a torchvision "
                         "alexnet checkpoint plus the lin-head file")
    return canon


if __name__ == "__main__":
    import sys

    raise SystemExit(_export_main(sys.argv[1:]))
