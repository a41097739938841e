"""Checkpoint/resume with named collections + surgical partial restores.

Mirrors the reference's five-way checkpoint layout (idr_train.py:329-378):
  <ckpt_dir>/{ModelParameters, IDROptimizerParameters, IDRSchedulerParameters,
              SGOptimizerParameters, SGSchedulerParameters, ...}/<epoch>.npz
with a `latest.npz` alias, resume restoring all collections + epoch
(:252-292), and the reference's surgical partial loads (:207-249, 294-306):
geometry-only, rendering-net-only, diffuse-layers-only, light-SGs from .npy,
and NeuS `sdf_network_fine` import from torch checkpoints.

Storage is flat npz keyed by pytree key-paths (pure numpy — orbax's async
machinery stalls against the remote-TPU backend in this environment, and a
flat-key format is what makes surgical restores trivial). Scheduler state
lives inside optax's optimizer state (step counts), so the scheduler
collections hold the iteration counter for layout parity.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

MODEL = "ModelParameters"
IDR_OPT = "IDROptimizerParameters"
IDR_SCHED = "IDRSchedulerParameters"
SG_OPT = "SGOptimizerParameters"
SG_SCHED = "SGSchedulerParameters"
CAM_OPT = "OptimizerCamParameters"
CAM = "CamParameters"


def _path_str(kp) -> str:
    parts = []
    for p in kp:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _leaf_to_numpy(v) -> np.ndarray:
    # checkpoints are written under an is_main() gate; in multi-host runs
    # the (replicated) leaves are not fully addressable and plain
    # np.asarray raises — read the local replica instead (collective-free)
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        from nefii_tpu.parallel import dist

        return dist.local_replica(v)
    return np.asarray(v)


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_str(kp): _leaf_to_numpy(v) for kp, v in flat}


def unflatten_like(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree shaped like `template` from flat path->array, keeping
    template values for missing paths (that's what makes restores surgical)."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, old in paths:
        key = _path_str(kp)
        if key in flat:
            arr = np.asarray(flat[key])
            if hasattr(old, "shape") and tuple(old.shape) != arr.shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs model {tuple(old.shape)}"
                )
            leaves.append(jax.numpy.asarray(arr, dtype=getattr(old, "dtype", arr.dtype)))
        else:
            leaves.append(old)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_collection(ckpt_dir: str, collection: str, tag, tree, extra: Optional[Dict] = None):
    d = os.path.join(ckpt_dir, collection)
    os.makedirs(d, exist_ok=True)
    flat = flatten_tree(tree)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = _leaf_to_numpy(v)
    path = os.path.join(d, f"{tag}.npz")
    np.savez(path + ".tmp.npz", **flat)
    os.replace(path + ".tmp.npz", path)


def load_collection(ckpt_dir: str, collection: str, tag, template=None):
    path = os.path.join(ckpt_dir, collection, f"{tag}.npz")
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    extra = {
        k.split("/", 1)[1]: flat.pop(k)
        for k in list(flat)
        if k.startswith("__extra__/")
    }
    if template is None:
        return flat, extra
    return unflatten_like(template, flat), extra


def save_all(
    ckpt_dir: str,
    epoch: int,
    params,
    idr_opt_state,
    sg_opt_state,
    cur_iter: int,
    cam_params=None,
    cam_opt_state=None,
):
    """Write every collection under both <epoch> and `latest` tags."""
    for tag in (str(epoch), "latest"):
        save_collection(ckpt_dir, MODEL, tag, params, {"epoch": epoch})
        save_collection(ckpt_dir, IDR_OPT, tag, idr_opt_state, {"epoch": epoch})
        save_collection(ckpt_dir, SG_OPT, tag, sg_opt_state, {"epoch": epoch})
        save_collection(ckpt_dir, IDR_SCHED, tag, {}, {"epoch": epoch, "cur_iter": cur_iter})
        save_collection(ckpt_dir, SG_SCHED, tag, {}, {"epoch": epoch, "cur_iter": cur_iter})
        if cam_params is not None:
            save_collection(ckpt_dir, CAM, tag, {"pose_vecs": cam_params}, {"epoch": epoch})
        if cam_opt_state is not None:
            save_collection(ckpt_dir, CAM_OPT, tag, cam_opt_state, {"epoch": epoch})


def load_all(ckpt_dir: str, tag, params, idr_opt_state, sg_opt_state,
             cam_params=None, cam_opt_state=None):
    params, extra = load_collection(ckpt_dir, MODEL, tag, params)
    epoch = int(extra.get("epoch", 0))
    idr_opt_state, _ = load_collection(ckpt_dir, IDR_OPT, tag, idr_opt_state)
    sg_opt_state, _ = load_collection(ckpt_dir, SG_OPT, tag, sg_opt_state)
    _, sched_extra = load_collection(ckpt_dir, IDR_SCHED, tag, {})
    cur_iter = int(sched_extra.get("cur_iter", 0))
    out_cam = cam_params
    out_cam_opt = cam_opt_state
    if cam_params is not None and os.path.exists(os.path.join(ckpt_dir, CAM, f"{tag}.npz")):
        loaded, _ = load_collection(ckpt_dir, CAM, tag, {"pose_vecs": cam_params})
        out_cam = loaded["pose_vecs"]
    if cam_opt_state is not None and os.path.exists(os.path.join(ckpt_dir, CAM_OPT, f"{tag}.npz")):
        out_cam_opt, _ = load_collection(ckpt_dir, CAM_OPT, tag, cam_opt_state)
    return params, idr_opt_state, sg_opt_state, epoch, cur_iter, out_cam, out_cam_opt


# ---------------------------------------------------------------------------
# surgical partial restores (reference idr_train.py:207-306)
# ---------------------------------------------------------------------------

def restore_subtree(params, ckpt_dir: str, tag, subtree: str):
    """Restore only params[subtree] from a checkpoint (geometry-only /
    rendering-only loads)."""
    flat, _ = load_collection(ckpt_dir, MODEL, tag)
    sub = {
        k: v for k, v in flat.items() if k.split("/")[0] == subtree
    }
    new = dict(params)
    new[subtree] = unflatten_like(params[subtree], {
        k.split("/", 1)[1]: v for k, v in sub.items()
    })
    return new


def restore_diffuse_only(params, ckpt_dir: str, tag):
    """Load only envmap_material_network/diffuse_albedo_layers (:232-244)."""
    flat, _ = load_collection(ckpt_dir, MODEL, tag)
    prefix = "envmap_material_network/diffuse_albedo_layers/"
    sub = {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}
    new = dict(params)
    mat = dict(new["envmap_material_network"])
    mat["diffuse_albedo_layers"] = unflatten_like(
        mat["diffuse_albedo_layers"], sub
    )
    new["envmap_material_network"] = mat
    return new


def load_light_npy(params, path: str):
    """Replace the light SGs/map from an .npy fit (:246-249)."""
    new = dict(params)
    mat = dict(new["envmap_material_network"])
    mat["lgtSGs"] = jax.numpy.asarray(np.load(path), jax.numpy.float32)
    new["envmap_material_network"] = mat
    return new


# ---------------------------------------------------------------------------
# torch checkpoint imports (geometry / NeuS; reference :294-306)
# ---------------------------------------------------------------------------

def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _torch_linear_to_ours(prefix: str, state: Dict, weight_norm: bool) -> Dict[str, np.ndarray]:
    """Map one torch (possibly weight-normed) Linear to our layer dict."""
    def g(name):
        t = state[prefix + name]
        return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t, np.float32)

    if weight_norm and (prefix + "weight_g") in state:
        return {"g": g("weight_g"), "v": g("weight_v"), "b": g("bias")}
    return {"w": g("weight"), "b": g("bias")}


def import_torch_implicit(params, path: str, *, module_prefix: str = "implicit_network.",
                          state_key: str = "model_state_dict"):
    """Import a torch ImplicitNetwork state dict (reference geometry ckpts).

    Accepts the reference's `model_state_dict` layout (lin0..linN with
    weight-norm g/v) or a NeuS `sdf_network_fine` dict (state_key
    'sdf_network_fine', module_prefix '').
    """
    ckpt = _torch_load(path)
    state = ckpt[state_key] if state_key and state_key in ckpt else ckpt
    layers = params["implicit_network"]["layers"]
    new_layers = []
    for i, layer in enumerate(layers):
        prefix = f"{module_prefix}lin{i}."
        if prefix + "weight_v" not in state and prefix + "weight" not in state:
            raise KeyError(f"missing layer {prefix}* in torch checkpoint")
        new_layers.append(
            jax.tree_util.tree_map(
                jax.numpy.asarray,
                _torch_linear_to_ours(prefix, state, weight_norm="v" in layer),
            )
        )
    new = dict(params)
    new["implicit_network"] = {"layers": new_layers}
    return new


def import_torch_idr(params, state: Dict):
    """Map a FULL reference IDRNetwork state_dict into our param tree.

    Covers all three trainable submodules of the reference composite
    (implicit_differentiable_renderer.py:249-253): the weight-normed
    `implicit_network.lin{i}` / `rendering_network.lin{i}` stacks, and the
    material network's plain-Linear sequential MLPs (torch Sequential indices
    count activations, so Linear keys are 0,2,4,... — mapped positionally onto
    our layer lists) plus direct tensors (lgtSGs, specular_reflectance, ...).

    `state` is a state_dict-like mapping of names to tensors/arrays, e.g.
    `torch.load(path)["model_state_dict"]` or `model.state_dict()`. Used by
    the torch-parity harness (tests/test_torch_parity.py).
    """
    def as_np(t):
        return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t,
                          np.float32)

    # DDP checkpoints prefix everything with "module."
    state = {k[7:] if k.startswith("module.") else k: v for k, v in state.items()}

    new = dict(params)
    for net in ("implicit_network", "rendering_network"):
        new_layers = [
            jax.tree_util.tree_map(
                jax.numpy.asarray,
                _torch_linear_to_ours(f"{net}.lin{i}.", state, "v" in layer),
            )
            for i, layer in enumerate(params[net]["layers"])
        ]
        sub = dict(params[net])
        sub["layers"] = new_layers
        new[net] = sub

    mat = dict(params["envmap_material_network"])
    mprefix = "envmap_material_network."
    for key, val in list(mat.items()):
        if isinstance(val, (list, tuple)):
            lin_idxs = sorted({
                int(k[len(mprefix) + len(key) + 1:].split(".")[0])
                for k in state
                if k.startswith(f"{mprefix}{key}.") and k.endswith(".weight")
            })
            if len(lin_idxs) != len(val):
                raise KeyError(
                    f"{mprefix}{key}: {len(lin_idxs)} torch Linears vs "
                    f"{len(val)} of ours"
                )
            mat[key] = [
                {"w": jax.numpy.asarray(as_np(state[f"{mprefix}{key}.{j}.weight"])),
                 "b": jax.numpy.asarray(as_np(state[f"{mprefix}{key}.{j}.bias"]))}
                for j in lin_idxs
            ]
        elif f"{mprefix}{key}" in state:
            mat[key] = jax.numpy.asarray(as_np(state[f"{mprefix}{key}"]))
    new["envmap_material_network"] = mat
    return new
