"""Fused SDF-MLP evaluation kernel (Pallas, TPU).

The sphere tracer's inner loop is SDF-MLP evaluation (SURVEY.md §3.1: the
hottest loop). XLA evaluates the 8x512 chain as 8 separate matmuls with the
[N,512] activations round-tripping HBM between layers (~4.3 GB of traffic per
131k-point evaluation) plus unfused softplus transcendentals. This kernel
keeps ALL layer weights resident in VMEM (~7.5 MB fp32 for the NeFII config)
and runs the whole chain — matmul + softplus(beta=100) per layer, including
the skip concatenation — per ray tile: HBM traffic drops to the input
embedding and the output hidden state.

Used only on the no-gradient tracer path (the trace is stop_gradient in the
reference too, implicit_differentiable_renderer.py:344-350), so no custom
VJP is needed; the differentiable shading path stays on the jnp
implementation. Numerics are fp32 with MXU-default precision — identical to
the jnp path's dot_general.

Weight preparation happens once per call outside the kernel: weight-norm is
resolved to effective weights, the skip layer's 1/sqrt(2) input scaling is
folded into its (split) weight matrices, and everything is padded to
TPU-friendly multiples.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.embedder import get_embedder
from nefii_tpu.models.mlp import effective_weight

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _embed(pts: jnp.ndarray, multires: int, x_pad: int) -> jnp.ndarray:
    """Positional encoding (models/embedder.py layout), padded to x_pad lanes.

    Runs INSIDE kernels (fused_trace.py always; here with embed_in_kernel=True)
    so callers can pass raw [N,3] points instead of a pre-embedded [N,39]
    buffer. Bit-identical to the XLA embedding; see build_fused_hidden's
    docstring for the measured speed trade-off.
    """
    if multires <= 0:
        parts = [pts]
    else:
        parts = [pts]
        for k in range(multires):
            freq = float(2.0 ** k)
            parts.append(jnp.sin(pts * freq))
            parts.append(jnp.cos(pts * freq))
    x = jnp.concatenate(parts, axis=-1)
    return jnp.pad(x, ((0, 0), (0, x_pad - x.shape[-1])))


def _pad_to(arr: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    r, c = arr.shape
    return jnp.pad(arr, ((0, rows - r), (0, cols - c)))


def prepare_weights(network, params: Dict[str, Any]):
    """Resolve weight-norm + padding + skip folding into kernel-ready arrays.

    Returns (static_plan, weight_list) where the plan describes each fused
    layer: ('dense', in_pad, out_pad) or ('skip', h_pad, x_pad, out_pad).
    """
    dims, _ = network._layer_dims()
    num_layers = len(dims)
    layers = params["layers"]
    d_in_emb = dims[0]
    x_pad = _round_up(d_in_emb, 8)

    plan = []
    weights: List[jnp.ndarray] = []
    for l in range(num_layers - 2):  # fused layers: all but the final linear
        w = effective_weight(layers[l]).T  # [in, out]
        b = layers[l]["b"]
        in_dim, out_dim = w.shape[0], w.shape[1]
        out_pad = _round_up(out_dim, 128)
        if l in network.skip_in:
            h_dim = in_dim - d_in_emb
            h_pad = _round_up(h_dim, 8)
            scale = 1.0 / np.sqrt(2.0)
            wa = _pad_to(w[:h_dim] * scale, h_pad, out_pad)
            wb = _pad_to(w[h_dim:] * scale, x_pad, out_pad)
            bp = jnp.pad(b, (0, out_pad - out_dim))
            plan.append(("skip", h_pad, x_pad, out_pad))
            weights += [wa, wb, bp.reshape(1, -1)]
        else:
            in_pad = _round_up(in_dim, 8) if l == 0 else _round_up(in_dim, 8)
            wp = _pad_to(w, in_pad, out_pad)
            bp = jnp.pad(b, (0, out_pad - out_dim))
            plan.append(("dense", in_pad, out_pad))
            weights += [wp, bp.reshape(1, -1)]
    return tuple(plan), weights


def _kernel(plan, n_weights, embed_cfg, x_ref, *refs):
    w_refs = refs[:n_weights]
    out_ref = refs[n_weights]

    if embed_cfg is not None:
        # raw [TM, 8]-padded points in; embed in fp32, then working dtype
        multires, x_pad, dtype = embed_cfg
        pts = x_ref[:][:, :3].astype(jnp.float32)
        x = _embed(pts, multires, x_pad).astype(dtype)
    else:
        x = x_ref[:]  # [TM, x_pad] pre-embedded input
    h = x
    wi = 0
    for kind, *dims in plan:
        if kind == "dense":
            in_pad, out_pad = dims
            w = w_refs[wi][:]
            b = w_refs[wi + 1][:]
            wi += 2
            h = jnp.dot(h[:, :in_pad], w, preferred_element_type=jnp.float32) + b
        else:  # skip: concat(h, x)/sqrt(2) folded into split weights
            h_pad, x_pad, out_pad = dims
            wa = w_refs[wi][:]
            wb = w_refs[wi + 1][:]
            b = w_refs[wi + 2][:]
            wi += 3
            h = (
                jnp.dot(h[:, :h_pad], wa, preferred_element_type=jnp.float32)
                + jnp.dot(x[:, :x_pad], wb, preferred_element_type=jnp.float32)
                + b
            )
        # softplus(beta=100): stable form; back to the working dtype
        h = (jax.nn.softplus(h * 100.0) * 0.01).astype(x.dtype)
    out_ref[:] = h


def build_fused_hidden(network, params: Dict[str, Any], tile: int = 512, interpret: bool = False,
                       dtype=jnp.float32, embed_in_kernel: bool = False):
    """Return fn(pts [N,3]) -> last hidden state [N, width] via the fused kernel.

    N is padded up to a tile multiple. With dtype=bfloat16, weights and
    activations are bf16 (matmul accumulation stays fp32): ~2x VMEM headroom
    at ~1e-2 relative SDF error — the TPU analogue of the reference
    benchmark's fp16 autocast (ray_tracing.py:397). MEASURED (v5e, 1.64M
    pts): bf16 is only ~1.11x faster than fp32, and an activation ablation
    (relu-only vs softplus: same time) plus a tile sweep (512 optimal fp32,
    1024 bf16 +4%) show the kernel is NOT VPU/softplus-bound — the remaining
    gap to MXU peak is the sequential inter-layer dependency within a tile.
    fp32 stays the default for bit-parity with the jnp path.

    embed_in_kernel=True feeds raw [N,3] points and computes the positional
    encoding inside the kernel (always fp32), skipping the concatenate/
    relayout/pad chain XLA otherwise materialises in HBM. MEASURED (v5e,
    1.64M pts, NeFII 8x512): bit-identical outputs but ~1.4x SLOWER than the
    pre-embedded path even including that chain — Mosaic's per-tile sin/cos
    serialises against the matmul pipeline. Default stays False; the option
    documents the experiment and suits VMEM-pressured callers.
    """
    plan, weights = prepare_weights(network, params)
    if dtype != jnp.float32:
        weights = [w.astype(dtype) for w in weights]
    dims, embed_fn = network._layer_dims()
    x_pad = _round_up(dims[0], 8)
    out_width = plan[-1][-1]
    n_w = len(weights)

    embed_cfg = (network.multires, x_pad, dtype) if embed_in_kernel else None
    kern = partial(_kernel, plan, n_w, embed_cfg)
    in_cols = 8 if embed_in_kernel else x_pad
    in_dtype = jnp.float32 if embed_in_kernel else dtype

    def fn(pts: jnp.ndarray) -> jnp.ndarray:
        N = pts.shape[0]
        n_pad = _round_up(max(N, tile), tile)
        if embed_in_kernel:
            x = jnp.pad(pts, ((0, n_pad - N), (0, in_cols - pts.shape[1]))).astype(in_dtype)
        else:
            x = embed_fn(pts)
            x = jnp.pad(x, ((0, n_pad - N), (0, x_pad - x.shape[1]))).astype(dtype)

        grid = (n_pad // tile,)
        in_specs = [
            pl.BlockSpec((tile, in_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] + [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM) for w in weights]
        # inside shard_map the inputs vary over the mesh axis; the output
        # varies the same way (per-shard rays) — propagate the vma so
        # shard_map's replication checking accepts the kernel
        try:
            vma = jax.typeof(x).vma
            out_shape = jax.ShapeDtypeStruct((n_pad, out_width), dtype, vma=vma)
        except (AttributeError, TypeError):
            out_shape = jax.ShapeDtypeStruct((n_pad, out_width), dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, out_width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(x, *weights)
        return out[:N]

    return fn


def build_fused_sdf(network, params: Dict[str, Any], tile: int = 512, interpret: bool = False,
                    dtype=jnp.float32, embed_in_kernel: bool = False):
    """fn(pts [N,3]) -> sdf [N] — fused hidden chain + final linear in jnp."""
    hidden_fn = build_fused_hidden(network, params, tile, interpret, dtype,
                                   embed_in_kernel=embed_in_kernel)
    dims, _ = network._layer_dims()
    last = params["layers"][-1]
    w_last = effective_weight(last).T  # [in, d_out]
    b_last = last["b"]
    real_width = dims[-2]

    def fn(pts: jnp.ndarray) -> jnp.ndarray:
        h = hidden_fn(pts)[:, :real_width].astype(jnp.float32)
        sdf = jax.lax.dot_general(
            h, w_last[:, :1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0] + b_last[0]
        return sdf

    return fn
