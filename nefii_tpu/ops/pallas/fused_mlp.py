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


def _embed_padded(pts: jnp.ndarray, embed_fn, n_pad: int, x_pad: int) -> jnp.ndarray:
    """Embed `pts` and deliver the kernel-ready [n_pad, x_pad] buffer in ONE
    materialised pass.

    The naive order — embed [N,39], then jnp.pad rows+cols to [n_pad,x_pad] —
    makes XLA materialise the embedding and then run a separate pad/relayout
    pass over the ~300 MB buffer at the train step's 2M-point sampler batch.
    Row-padding the cheap [N,3] input FIRST and folding the zero lane-pad
    into the embedding's own concatenate lets XLA emit the kernel-ready
    buffer in one pass. MEASURED (v5e, 2.1M pts, full build_fused_sdf call):
    93.4 -> 91.5 ms — XLA already fuses most of the chain, so the win is ~2%
    of the call, invisible in the full train step (1.03 s both ways); kept
    because it is strictly less data movement and simpler to reason about.
    Real rows are elementwise identical (bit-exact); pad rows hold embed(0)
    instead of zeros and every caller slices them off."""
    N, d = pts.shape
    p = jnp.pad(pts, ((0, n_pad - N), (0, 0)))
    x = embed_fn(p)
    if x.shape[-1] < x_pad:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad, x_pad - x.shape[-1]), x.dtype)], axis=-1
        )
    return x


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
            in_pad = _round_up(in_dim, 8)
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
            x = _embed_padded(pts, embed_fn, n_pad, x_pad).astype(dtype)

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


def _kernel_fwd_bwd(plan, n_weights, x_ref, *refs):
    """Forward chain + input-gradient backward in one VMEM-resident pass.

    refs = (*weights, wlast_col, h_out, dx_out, z_scratch). The backward
    seeds from the final linear's sdf column (d sdf / d last_hidden =
    w_last[:, 0]) and back-propagates through the stored pre-activations:
    g_z = g_h * sigmoid(100 z) (the exact VJP of softplus(100x)/100), then
    g_h = g_z @ W^T — with the skip layer routing its input-embedding part
    into a separate accumulator. No parameter gradients are computed: the
    kernel is for value-only contexts (frozen geometry / eval shading).
    """
    w_refs = refs[:n_weights]
    wlast_ref = refs[n_weights]
    h_out_ref = refs[n_weights + 1]
    dx_out_ref = refs[n_weights + 2]
    z_scr = refs[n_weights + 3]

    x = x_ref[:]
    tile_m = x.shape[0]

    # ---- forward, storing pre-activations --------------------------------
    h = x
    wi = 0
    w_index = []  # per-layer starting weight index, for the backward
    for li, (kind, *dims) in enumerate(plan):
        w_index.append(wi)
        if kind == "dense":
            in_pad, out_pad = dims
            w = w_refs[wi][:]
            b = w_refs[wi + 1][:]
            wi += 2
            z = jnp.dot(h[:, :in_pad], w, preferred_element_type=jnp.float32) + b
        else:  # skip
            h_pad, x_pad, out_pad = dims
            wa = w_refs[wi][:]
            wb = w_refs[wi + 1][:]
            b = w_refs[wi + 2][:]
            wi += 3
            z = (
                jnp.dot(h[:, :h_pad], wa, preferred_element_type=jnp.float32)
                + jnp.dot(x[:, :x_pad], wb, preferred_element_type=jnp.float32)
                + b
            )
        z_scr[li, :, : z.shape[-1]] = z
        h = jax.nn.softplus(z * 100.0) * 0.01
    h_out_ref[:] = h

    # ---- backward (input gradient of the sdf column) ---------------------
    g = jnp.broadcast_to(wlast_ref[:], (tile_m, wlast_ref.shape[-1]))
    gx = jnp.zeros_like(x)
    for li in range(len(plan) - 1, -1, -1):
        kind, *dims = plan[li]
        out_pad = dims[-1]
        wi = w_index[li]
        if g.shape[-1] < out_pad:
            # the layer above consumed only h_pad (8-aligned) lanes of this
            # layer's 128-aligned padded output; the extra lanes are padding
            # whose gradient is zero
            g = jnp.pad(g, ((0, 0), (0, out_pad - g.shape[-1])))
        z = z_scr[li, :, :out_pad]
        gz = g[:, :out_pad] * jax.nn.sigmoid(z * 100.0)
        if kind == "dense":
            in_pad = dims[0]
            w = w_refs[wi][:]
            g = jax.lax.dot_general(
                gz, w, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            wa = w_refs[wi][:]
            wb = w_refs[wi + 1][:]
            g = jax.lax.dot_general(
                gz, wa, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gx = gx + jax.lax.dot_general(
                gz, wb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # after layer 0 the running gradient is w.r.t. the embedded input
    dx_out_ref[:] = gx + g


def _pe_backward(dx_emb: jnp.ndarray, pts: jnp.ndarray, multires: int) -> jnp.ndarray:
    """VJP of the positional encoding: [N, d(1+2m)] cotangent -> [N, d]."""
    d = pts.shape[-1]
    dp = dx_emb[:, :d]
    for k in range(multires):
        f = float(2.0 ** k)
        s = d + 2 * k * d
        c = d + (2 * k + 1) * d
        dp = dp + f * (
            jnp.cos(pts * f) * dx_emb[:, s : s + d]
            - jnp.sin(pts * f) * dx_emb[:, c : c + d]
        )
    return dp


def build_fused_sdf_feature_grad(network, params: Dict[str, Any], tile: int = 256,
                                 interpret: bool = False):
    """fn(pts [N,3]) -> (sdf [N], feature [N,F], grad [N,3]), value-only.

    Fuses the shading path's `ImplicitNetwork.sdf_feature_grad` — one forward
    plus one input-space backward through the whole MLP — into a single
    Pallas launch with weights AND the per-tile pre-activations resident in
    VMEM (the XLA autodiff path round-trips every layer's activations through
    HBM twice: saved in the forward, re-read in the transpose). Legal only
    where all three outputs are values, i.e. frozen geometry (the shipped
    Step-2 workflow; reference robot/run_s2.sh:21 --freeze_geometry) or eval
    rendering — parameter gradients are NOT produced, so callers must pass
    stop-gradiented params/points (enforced with stop_gradient inside).

    VMEM: ~7.5 MB weights + plan_len * tile * width * 4 B pre-activations
    (4 MB at tile=256 for the 8x512 NeFII net) — fits the ~16 MB/core budget.
    """
    assert network.d_out == 1, "sdf gradient kernel assumes a single sdf output"
    plan, weights = prepare_weights(network, params)
    dims, embed_fn = network._layer_dims()
    x_pad = _round_up(dims[0], 8)
    out_width = plan[-1][-1]
    real_width = dims[-2]
    max_out = max(p[-1] for p in plan)
    L = len(plan)
    n_w = len(weights)

    last = params["layers"][-1]
    w_last = effective_weight(last).T  # [width, d_out(+F)]
    b_last = last["b"]
    wlast_col = jnp.pad(w_last[:, 0], (0, out_width - real_width)).reshape(1, -1)

    kern = partial(_kernel_fwd_bwd, plan, n_w)
    d_in = network.d_in

    def fn(pts: jnp.ndarray):
        pts = jax.lax.stop_gradient(pts)
        N = pts.shape[0]
        n_pad = _round_up(max(N, tile), tile)
        emb_dim = dims[0]
        x = _embed_padded(
            pts, embed_fn if network.multires > 0 else (lambda p: p), n_pad, x_pad
        )

        grid = (n_pad // tile,)
        in_specs = (
            [pl.BlockSpec((tile, x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)
               for w in weights]
            + [pl.BlockSpec((1, out_width), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        )
        try:
            vma = jax.typeof(x).vma
            out_shape = (
                jax.ShapeDtypeStruct((n_pad, out_width), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((n_pad, x_pad), jnp.float32, vma=vma),
            )
        except (AttributeError, TypeError):
            out_shape = (
                jax.ShapeDtypeStruct((n_pad, out_width), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, x_pad), jnp.float32),
            )
        h, dx = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((tile, out_width), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((L, tile, max_out), jnp.float32)],
            interpret=interpret,
        )(x, *weights, wlast_col)
        h = h[:N, :real_width]
        dx = dx[:N, :emb_dim]

        fin = jax.lax.dot_general(
            h, w_last, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_last
        sdf = fin[:, 0]
        feature = h if network.use_last_as_f else fin[:, 1:]
        grad = _pe_backward(dx, pts, network.multires) if network.multires > 0 else dx[:, :d_in]
        return sdf, feature, grad

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
