"""Fused bidirectional sphere-trace kernel (Pallas, TPU).

SURVEY §7.2 target #2: the whole sphere-tracing loop — positional encoding,
the full SDF-MLP chain, step/back-step/mask arithmetic — runs inside ONE
Pallas kernel per ray tile, with the MLP weights VMEM-resident across ALL
trace iterations and a per-tile early exit (`lax.cond` skips the remaining
iterations once every ray in the tile has converged; the jnp path's global
`lax.while_loop` runs every ray for as many iterations as the slowest ray in
the whole batch).

Semantics are bit-equal to RayTracer._sphere_trace (ops/ray_tracing.py:
145-218), which itself mirrors the reference's bidirectional tracer with
back-stepping line search (reference model/ray_tracing.py:104-193): converged
rays are frozen by the same masks, so extra / skipped iterations change only
the evaluation COUNT, never per-ray results. The count of executed SDF
evaluations is accumulated per tile and summed, keeping TraceResult.n_evals
an honest measurement.

Only the no-grad tracer path uses this (the trace is stop_gradient in the
reference too); the jnp implementation remains the correctness oracle
(tests/test_fused_trace.py).

MEASURED RESULT (v5e, 131k rays, NeFII 8x512 SDF, conf.conf tracer): the
early exit does cut SDF evaluations (8.65M -> 3.23M on coherent image-grid
rays) but wall-clock only reaches ~parity with the jnp tracer there, and is
~1.7x SLOWER on incoherent (training-batch) rays — the jnp tracer's SDF
closure already runs the VMEM-resident fused-MLP kernel (fused_mlp.py), so
this kernel's remaining edge is only the stepping arithmetic, and Mosaic's
per-tile `lax.cond` + scalar-`any` synchronisation costs more than that
saves at tile=256 (tile=512 exceeds the 16MB scoped-VMEM limit with the
7.5MB weight set). Kept as an off-by-default option (`use_fused_trace`) for
workloads with strong tile coherence; `use_fused_sdf` is the production
path.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.mlp import effective_weight
from nefii_tpu.ops.pallas.fused_mlp import (
    HAVE_PALLAS, _embed, _round_up, prepare_weights,
)

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _mlp_chain(plan, w_refs, x):
    """The fused hidden chain (same math as fused_mlp._kernel)."""
    h = x
    wi = 0
    for kind, *dims in plan:
        if kind == "dense":
            in_pad, _ = dims
            w = w_refs[wi][:]
            b = w_refs[wi + 1][:]
            wi += 2
            h = jnp.dot(h[:, :in_pad], w, preferred_element_type=jnp.float32) + b
        else:  # skip layer, 1/sqrt(2) folded into split weights
            h_pad, x_pad, _ = dims
            wa = w_refs[wi][:]
            wb = w_refs[wi + 1][:]
            b = w_refs[wi + 2][:]
            wi += 3
            h = (
                jnp.dot(h[:, :h_pad], wa, preferred_element_type=jnp.float32)
                + jnp.dot(x[:, :x_pad], wb, preferred_element_type=jnp.float32)
                + b
            )
        h = (jax.nn.softplus(h * 100.0) * 0.01).astype(x.dtype)
    return h


def _trace_kernel(plan, n_w, cfg, ray_ref, *refs):
    """One ray tile: full bidirectional sphere trace.

    cfg: (T, multires, x_pad, width, sdf_threshold, line_search_step,
          line_step_iters, sphere_tracing_iters)
    """
    (T, multires, x_pad, width, thresh, ls_step, ls_iters, trace_iters) = cfg
    w_refs = refs[:n_w]
    wl_ref = refs[n_w]        # [1, width_pad] final-linear weights (sdf column)
    bl_ref = refs[n_w + 1]    # [1, 1] final bias (SMEM)
    acc_s_ref, acc_e_ref, unf_s_ref, evals_ref = refs[n_w + 2:]

    data = ray_ref[:]                     # [T, 16]
    cam = data[:, 0:3]
    dirs = data[:, 3:6]
    near = data[:, 6:7]
    far = data[:, 7:8]
    isect = data[:, 8:9]                  # 1.0/0.0 float mask

    wl = wl_ref[:]                        # [1, width_pad]
    bl = bl_ref[0, 0]

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    # NOTE: all masks are carried as f32 (1.0/0.0), never bool — Mosaic
    # cannot legalize scf.for/scf.if with loop-carried vector<i1> state
    # ("failed to legalize operation 'scf.for'").
    def sdf_both(acc_s, acc_e, m_s, m_e):
        pts = jnp.concatenate([cam + acc_s * dirs, cam + acc_e * dirs], axis=0)
        x = _embed(pts, multires, x_pad)  # [2T, x_pad]
        h = _mlp_chain(plan, w_refs, x)   # [2T, width_pad]
        sdf = jnp.sum(h * wl, axis=-1, keepdims=True) + bl  # [2T, 1]
        s, e = sdf[:T], sdf[T:]
        return s * m_s, e * m_e

    def head(unf_s, unf_e, next_s, next_e):
        curr_s = next_s * unf_s
        curr_s = jnp.where(curr_s <= thresh, zero, curr_s)
        curr_e = next_e * unf_e
        curr_e = jnp.where(curr_e <= thresh, zero, curr_e)
        live_s = jnp.where(curr_s > thresh, one, zero)
        live_e = jnp.where(curr_e > thresh, one, zero)
        return curr_s, curr_e, unf_s * live_s, unf_e * live_e

    acc_s = near * isect
    acc_e = far * isect
    next_s, next_e = sdf_both(acc_s, acc_e, isect, isect)
    curr_s, curr_e, unf_s, unf_e = head(isect, isect, next_s, next_e)
    n_ev = jnp.int32(2 * T)

    def iter_body(_, state):
        def live(state):
            curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_ev = state
            acc_s2 = acc_s + curr_s
            acc_e2 = acc_e - curr_e
            next_s, next_e = sdf_both(acc_s2, acc_e2, unf_s, unf_e)
            n_ev2 = n_ev + 2 * T

            # back-step line search (line_step_iters is static, usually 1)
            for j in range(ls_iters):
                def ls(args):
                    acc_s2, acc_e2, next_s, next_e, n_ev2 = args
                    np_s = jnp.where(next_s < 0, one, zero)
                    np_e = jnp.where(next_e < 0, one, zero)
                    factor = (1.0 - ls_step) * (2.0 ** (-j))
                    acc_s2 = acc_s2 - np_s * factor * curr_s
                    acc_e2 = acc_e2 + np_e * factor * curr_e
                    sd_s, sd_e = sdf_both(acc_s2, acc_e2, np_s, np_e)
                    next_s2 = jnp.where(np_s > 0.5, sd_s, next_s)
                    next_e2 = jnp.where(np_e > 0.5, sd_e, next_e)
                    return acc_s2, acc_e2, next_s2, next_e2, n_ev2 + 2 * T

                args = (acc_s2, acc_e2, next_s, next_e, n_ev2)
                acc_s2, acc_e2, next_s, next_e, n_ev2 = jax.lax.cond(
                    jnp.any(next_s < 0) | jnp.any(next_e < 0),
                    ls, lambda a: a, args,
                )

            not_crossed = jnp.where(acc_s2 < acc_e2, one, zero)
            unf_s2 = unf_s * not_crossed
            unf_e2 = unf_e * not_crossed
            curr_s2, curr_e2, unf_s2, unf_e2 = head(unf_s2, unf_e2, next_s, next_e)
            return curr_s2, curr_e2, unf_s2, unf_e2, acc_s2, acc_e2, n_ev2

        curr_s, curr_e, unf_s, unf_e, *_ = state
        return jax.lax.cond(
            jnp.any(unf_s > 0.5) | jnp.any(unf_e > 0.5), live, lambda s: s, state
        )

    state = (curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_ev)
    _, _, unf_s, _, acc_s, acc_e, n_ev = jax.lax.fori_loop(
        0, trace_iters, iter_body, state
    )

    acc_s_ref[:] = acc_s
    acc_e_ref[:] = acc_e
    unf_s_ref[:] = unf_s

    # grid steps run sequentially on TPU; accumulate the tile counts into the
    # single (1,1) SMEM cell (block == array shape, revisited every step)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        evals_ref[0, 0] = 0

    evals_ref[0, 0] += n_ev


def build_fused_sphere_trace(
    network,
    params: Dict[str, Any],
    tracer,
    tile: int = 256,
    interpret: bool = False,
):
    """Return fn(cam [N,3], dirs [N,3], mask_intersect [N], near [N], far [N])
    -> (acc_start, acc_end, unfinished_start, min_dis, max_dis, n_evals),
    the exact output contract of RayTracer._sphere_trace."""
    plan, weights = prepare_weights(network, params)
    dims, _ = network._layer_dims()
    x_pad = _round_up(dims[0], 8)
    width = dims[-2]
    width_pad = plan[-1][-1]
    n_w = len(weights)

    last = params["layers"][-1]
    w_last = effective_weight(last).T[:, 0:1]  # [width, 1] sdf column
    wl = jnp.pad(w_last[:, 0], (0, width_pad - width)).reshape(1, width_pad)
    bl = jnp.asarray(last["b"][0], jnp.float32).reshape(1, 1)

    cfg = (
        tile, network.multires, x_pad, width,
        float(tracer.sdf_threshold), float(tracer.line_search_step),
        int(tracer.line_step_iters), int(tracer.sphere_tracing_iters),
    )
    kern = partial(_trace_kernel, plan, n_w, cfg)

    def fn(cam, dirs, mask_intersect, near, far):
        N = cam.shape[0]
        n_pad = _round_up(max(N, tile), tile)
        ray_data = jnp.zeros((n_pad, 16), jnp.float32)
        ray_data = ray_data.at[:N, 0:3].set(cam)
        ray_data = ray_data.at[:N, 3:6].set(dirs)
        ray_data = ray_data.at[:N, 6].set(near)
        ray_data = ray_data.at[:N, 7].set(far)
        ray_data = ray_data.at[:N, 8].set(mask_intersect.astype(jnp.float32))

        grid = (n_pad // tile,)
        in_specs = [
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for w in weights
        ]
        in_specs += [
            pl.BlockSpec(wl.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        col = lambda i: (i, 0)
        out_specs = [
            pl.BlockSpec((tile, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        try:
            vma = jax.typeof(ray_data).vma
            mk = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, vma=vma)
        except (AttributeError, TypeError):
            mk = jax.ShapeDtypeStruct
        out_shape = [
            mk((n_pad, 1), jnp.float32),
            mk((n_pad, 1), jnp.float32),
            mk((n_pad, 1), jnp.float32),
            mk((1, 1), jnp.int32),
        ]
        acc_s, acc_e, unf_s, evals = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(ray_data, *weights, wl, bl)

        acc_start = acc_s[:N, 0]
        acc_end = acc_e[:N, 0]
        unfinished = unf_s[:N, 0] > 0.5
        min_dis = jnp.where(mask_intersect, near, 0.0)
        max_dis = jnp.where(mask_intersect, far, 0.0)
        return acc_start, acc_end, unfinished, min_dis, max_dis, evals[0, 0]

    return fn
