"""SPMD train/render steps: shard_map over the ray axis.

Replaces the reference's DDP machinery (idr_train.py:28-40,308-311; SURVEY.md
§2.6). Design:

  * params replicated, pixel/ray batch sharded over a 1-D `ray` mesh axis;
  * the forward (sphere tracing included) runs fully shard-local — the
    tracer's while-loop convergence tests and the compaction argsorts stay
    per-chip, so no per-iteration collectives (the reason for shard_map over
    GSPMD auto-sharding here);
  * the loss's masked means psum (num, den) pairs over the axis, making the
    sharded loss bit-identical to single-chip;
  * per-shard gradients are psum'd — together with the global denominators
    this reproduces exact global gradients (what DDP's all-reduce-of-averaged
    grads only approximates under masked losses);
  * per-chip RNG: the step key is folded with the axis index, mirroring the
    reference's shared-sampler-seed + disjoint-pixel-shard scheme.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from nefii_tpu.models.idr import OVERFLOW_KEYS
from nefii_tpu.parallel.mesh import RAY_AXIS

# keys sharded along their pixel axis (axis 1 for [B,S,...], axis 0 for flat)
_BATCH_AXIS1 = {"uv", "object_mask", "rgb", "pixel_visible"}
_BATCH_AXIS0 = {"points", "ray_dirs"}


def batch_pspec(batch: Dict[str, Any], axis_name: str = RAY_AXIS):
    specs = {}
    for k, v in batch.items():
        if k in _BATCH_AXIS1:
            specs[k] = P(None, axis_name)
        elif k in _BATCH_AXIS0:
            specs[k] = P(axis_name)
        else:
            specs[k] = P()
    return specs


def make_grad_fn(
    model,
    loss,
    mesh: Mesh,
    *,
    axis_name: str = RAY_AXIS,
    freeze_geo: bool = False,
    fake_roughness: bool = False,
    fake_specular: bool = False,
    with_secondary: bool = True,
    train_cameras: bool = False,
    remat: bool = False,
):
    """Build the shard-mapped (loss, grads, secondary) function for training.

    With `train_cameras`, the step additionally differentiates the camera
    pose embedding: `pose_vecs` [N_img,7] quaternion+translation rows are
    gathered by `batch['pose_indices']` into the forward's pose input and a
    (replicated) gradient w.r.t. the full embedding is returned (non-batch
    rows receive zero gradient — the reference's SparseAdam rows).

    `remat` wraps the forward in `jax.checkpoint`: the backward recomputes
    the forward instead of storing its activations, trading ~1 extra forward
    for the activation memory — the TPU analogue of the reference's
    `memory_capacity_level` chunking pressure valve. Unfrozen-geometry
    training at the reference scale (2048 px x 64 rays) needs 19.2 GB of
    activations without it (v5e HBM is 15.75 GB).
    """

    from nefii_tpu.models.idr import PT_RENDER_TYPES

    has_secondary = (
        with_secondary
        and PT_RENDER_TYPES.get(model.render_type, {}).get("shadow") is not None
    )
    secondary_keys = (
        ("secondary_points", "secondary_mask", "secondary_dir") if has_secondary else ()
    )

    def fwd(p, b, key):
        return model.forward(
            p, b, key, training=True, freeze_geo=freeze_geo,
            fake_roughness=fake_roughness, fake_specular=fake_specular,
        )

    if remat:
        fwd = jax.checkpoint(fwd)

    def local_fn(params, pose_vecs, batch, gt, key, alpha):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def loss_fn(p, pv):
            b = dict(batch)
            if train_cameras:
                b["pose"] = pv[b.pop("pose_indices")]
            out = fwd(p, b, key)
            ld = loss(out, gt, alpha=alpha, axis_name=axis_name)
            return ld["loss"], (ld, out)

        # the psums inside the loss make it a global scalar; shard_map's AD
        # transposes them correctly, so per-shard grads are already the full
        # (replicated) global gradient — no extra psum.
        (_, (ld, out)), (grads, cam_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, pose_vecs)
        secondary = {k: out[k] for k in secondary_keys if out.get(k) is not None}
        # budget-overflow counters (global sums): rays a compaction budget
        # silently degraded to defaults this step — the trainer warns when
        # any are nonzero (the budgets' exactness claim must be observable)
        ld = dict(ld)
        for k in OVERFLOW_KEYS:
            v = out.get(k)
            if v is not None:
                ld[k] = jax.lax.psum(jnp.asarray(v, jnp.int32), axis_name)
        return ld, grads, cam_grads, secondary

    def build(sample_batch, sample_gt):
        in_specs = (
            P(),  # params replicated
            P(),  # pose_vecs replicated
            batch_pspec(sample_batch, axis_name),
            batch_pspec(sample_gt, axis_name),
            P(),  # key
            P(),  # alpha
        )
        out_specs = (
            P(),  # loss dict (replicated scalars)
            P(),  # grads (replicated)
            P(),  # cam grads (replicated)
            {k: P(None, axis_name) for k in secondary_keys},
        )
        fn = shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            
        )
        if train_cameras:
            return fn

        # camera-static wrapper keeping the old 5-arg signature
        def wrapped(params, batch, gt, key, alpha):
            dummy = jnp.zeros((1, 7), jnp.float32)
            ld, grads, _, secondary = fn(params, dummy, batch, gt, key, alpha)
            return ld, grads, secondary

        return wrapped

    return build


def make_eval_forward(
    model,
    mesh: Mesh,
    *,
    axis_name: str = RAY_AXIS,
    output_keys: Tuple[str, ...] = (
        "idr_rgb_values", "sg_rgb_values", "normal_values",
        "sg_diffuse_rgb_values", "sg_diffuse_albedo_values",
        "sg_specular_rgb_values", "sg_roughness_values",
        "sg_specular_reflection_values", "network_object_mask",
        "points",
    ),
):
    """Shard-mapped eval forward: each chip renders its ray shard; outputs
    are reassembled along the ray axis (replacing render.py's pickled
    dist.gather_object, reference idr_train.py:443-447). Budget-overflow
    counters ride along as global (psum'd) scalars so render/vis callers can
    warn when a compaction budget degraded rays. When `model.measure_demand`
    is set (a budget-sizing probe, models/budgets.py), the DEMAND_KEYS
    counters ride along the same way — psum'd global demand, which the
    sizing divides back per shard."""

    overflow_keys = OVERFLOW_KEYS
    if getattr(model, "measure_demand", False):
        from nefii_tpu.models.idr import DEMAND_KEYS

        overflow_keys = OVERFLOW_KEYS + DEMAND_KEYS

    def local_fn(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        out = model.forward(params, batch, key, training=False)
        res = {k: out[k] for k in output_keys}
        for k in overflow_keys:
            # forward_with_uv emits every overflow key unconditionally
            # (models/idr.py:552-556) and the static out_specs below rely on
            # it — fail loudly here if a future variant breaks the invariant
            res[k] = jax.lax.psum(jnp.asarray(out[k], jnp.int32), axis_name)
        return res

    def build(sample_batch):
        in_specs = (P(), batch_pspec(sample_batch, axis_name), P())

        def wrapped(params, batch, key):
            # forward_with_uv emits every OVERFLOW_KEY unconditionally
            # (models/idr.py:552-556), so the out_specs are static — no
            # eval_shape probe (which would abstractly re-trace the whole
            # forward per compile just to learn this)
            out_specs = {k: P(axis_name) for k in output_keys}
            out_specs.update({k: P() for k in overflow_keys})
            return shard_map(
                local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            )(params, batch, key)

        return wrapped

    return build


def make_point_grad_fn(
    model,
    mesh: Mesh,
    *,
    axis_name: str = RAY_AXIS,
    freeze_geo: bool = False,
    fake_roughness: bool = False,
    fake_specular: bool = False,
):
    """Shard-mapped secondary self-distillation gradient:
    L1(sg_rgb, idr_rgb) over valid secondary points (reference
    idr_train.py:804-852 — neither side is detached there, so gradients
    flow into BOTH the SG/material path and the idr radiance cache, and,
    when geometry is unfrozen at the run level, into the implicit net
    through the feature path; see IDRNetwork.forward_with_point)."""

    def local_fn(params, batch, valid, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def loss_fn(p):
            out = model.forward(
                p, batch, key, with_point=True, freeze_geo=freeze_geo,
                fake_roughness=fake_roughness, fake_specular=fake_specular,
            )
            diff = jnp.abs(out["sg_rgb_values"] - out["idr_rgb_values"])
            num = jax.lax.psum((diff * valid[:, None]).sum(), axis_name)
            den = jax.lax.psum(valid.sum() * 3.0, axis_name)
            loss = jnp.where(den > 0, num / jnp.clip(den, 1.0), 0.0)
            ovf = jax.lax.psum(
                jnp.asarray(out.get("secondary_overflow", 0), jnp.int32),
                axis_name,
            )
            return loss, ovf

        (l, ovf), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # dict return keeps the (ld, grads) 2-tuple shape callers unpack;
        # the distillation trace's budget overflow must be observable too
        return {"loss": l, "secondary_overflow": ovf}, grads

    def build():
        in_specs = (P(), {"points": P(axis_name), "ray_dirs": P(axis_name)}, P(axis_name), P())
        out_specs = (P(), P())
        return shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            
        )

    return build
