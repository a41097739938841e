"""Importance sampling for the MC path tracer.

TPU-native equivalent of the sampling half of the reference's
model/path_tracing_render.py:
  * rotate_to_normal local->world frame (:12-33)
  * uniform hemisphere (:36-58), GGX BRDF (:61-103), cosine (:128-156)
  * mixture-of-SG light sampling with per-component CDF inversion (:168-242)
  * 2D-envmap luminance x sin(theta) CDF sampling a la PBRT (:274-343)
  * matching pdf functions and the MIS power heuristic (:385-401)

Differences from the reference by design:
  - randomness is explicit `jax.random` keys (deterministic, replayable,
    shardable per-chip) instead of global torch RNG state;
  - the mixture-component draw uses a gather by argmax over the CDF interval
    instead of boolean fancy-indexing (fixed shapes for XLA).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TINY_NUMBER = 1e-6


def rotate_to_normal(xyz: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Rotate local coords (z-up) into the frame whose z-axis is `n`. [...,3]."""
    x_axis = jnp.zeros_like(n).at[..., 0].set(1.0)
    y_axis = jnp.zeros_like(n).at[..., 1].set(1.0)
    vup = jnp.where(n[..., 0:1] > 0.9, y_axis, x_axis)
    t = jnp.cross(vup, n)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + TINY_NUMBER)
    s = jnp.cross(t, n)
    return xyz[..., :1] * t + xyz[..., 1:2] * s + xyz[..., 2:] * n


def uniform_hemisphere_sampling(key: jax.Array, normal: jnp.ndarray) -> jnp.ndarray:
    """Uniform directions on the hemisphere about `normal`; pdf = 1/(2 pi)."""
    base_shape = normal.shape[:-1]
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, base_shape + (1,))
    r2 = jax.random.uniform(k2, base_shape + (1,))
    z = r1
    phi = 2 * np.pi * r2
    sin_theta = jnp.sqrt(1 - r1**2)
    local = jnp.concatenate([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, z], -1)
    return rotate_to_normal(local, normal)


# ---------------------------------------------------------------------------
# cosine-weighted
# ---------------------------------------------------------------------------

def cos_sampling(key: jax.Array, normal: jnp.ndarray):
    """Cosine-weighted hemisphere sample; returns (wi [...,3], pdf [...,1])."""
    base_shape = normal.shape[:-1]
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, base_shape + (1,))
    r2 = jax.random.uniform(k2, base_shape + (1,))
    theta = jnp.arccos(jnp.sqrt(1 - r1))
    phi = 2 * np.pi * r2
    z = jnp.cos(theta)
    local = jnp.concatenate(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), z], -1
    )
    wi = rotate_to_normal(local, normal)
    pdf = z / np.pi
    return wi, pdf


def pdf_fn_cos(wi, normal, viewdir, roughness, lgt):
    cos_theta = jnp.clip(jnp.sum(wi * normal, -1, keepdims=True), TINY_NUMBER)
    return cos_theta / np.pi


# ---------------------------------------------------------------------------
# GGX BRDF
# ---------------------------------------------------------------------------

def brdf_sampling(key: jax.Array, normal: jnp.ndarray, roughness: jnp.ndarray, viewdir: jnp.ndarray):
    """GGX NDF importance sample of the half-vector; (wi [...,3], pdf [...,1])."""
    base_shape = normal.shape[:-1]
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, base_shape + (1,))
    r2 = jax.random.uniform(k2, base_shape + (1,))

    theta = jnp.arctan(roughness**2 * jnp.sqrt(r1 / (1 - r1 + TINY_NUMBER)))
    phi = 2 * np.pi * r2
    z = jnp.cos(theta)
    h = jnp.concatenate(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), z], -1
    )
    h = rotate_to_normal(h, normal)
    wi = 2 * jnp.sum(viewdir * h, -1, keepdims=True) * h - viewdir
    pdf = pdf_fn_brdf_ggx(wi, normal, viewdir, roughness, None)
    return wi, pdf


def pdf_fn_brdf_ggx(wi, normal, viewdir, roughness, lgt):
    h = wi + viewdir
    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    # wi == -viewdir degenerates; fall back to the normal (reference :109-111)
    h = jnp.where(norm > TINY_NUMBER, h / (norm + TINY_NUMBER), normal)

    cos_theta = jnp.clip(jnp.sum(h * normal, -1, keepdims=True), TINY_NUMBER)
    # stable GGX NDF pdf (reference :116-119)
    root = cos_theta**2 + (1 - cos_theta**2) / (roughness**4)
    pdf_h = cos_theta / (np.pi * (roughness**4) * root * root)
    h_dot_v = jnp.clip(jnp.sum(h * viewdir, -1, keepdims=True), TINY_NUMBER)
    return pdf_h / (4 * h_dot_v)


# ---------------------------------------------------------------------------
# mixture-of-SG light sampling
# ---------------------------------------------------------------------------

def _sg_mixture_weights(normal: jnp.ndarray, lgtSGs: jnp.ndarray):
    """alpha_k over components: energy x clamped <n, xi_k> (reference :189-194)."""
    xis = lgtSGs[..., :3] / (
        jnp.linalg.norm(lgtSGs[..., :3], axis=-1, keepdims=True) + TINY_NUMBER
    )
    lambdas = jnp.abs(lgtSGs[..., 3:4])
    mus = jnp.abs(lgtSGs[..., -3:])
    mus_energy = mus.sum(-1, keepdims=True)
    n_xi = jnp.sum(normal[..., None, :] * xis, -1, keepdims=True)
    weight = mus_energy * jnp.clip(n_xi, TINY_NUMBER)
    alpha = weight / weight.sum(-2, keepdims=True)
    return xis, lambdas, mus, alpha


def mix_sg_sampling(key: jax.Array, normal: jnp.ndarray, lgtSGs: jnp.ndarray):
    """Sample wi from the SG mixture (reference :168-242). lgtSGs [..., M, 7]."""
    base_shape = normal.shape[:-1]
    xis, lambdas, mus, alpha = _sg_mixture_weights(normal, lgtSGs)

    k0, k1, k2 = jax.random.split(key, 3)
    # categorical draw over components via CDF interval containment
    cdf = jnp.cumsum(alpha, axis=-2)  # [..., M, 1]
    r0 = jax.random.uniform(k0, base_shape + (1, 1))
    chosen = jnp.argmax(r0 < cdf, axis=-2)  # [..., 1] first interval containing r0
    idx = chosen[..., None, :]  # [..., 1, 1]
    xis_k = jnp.take_along_axis(xis, jnp.broadcast_to(idx, idx.shape[:-1] + (3,)), axis=-2)[..., 0, :]
    lambdas_k = jnp.take_along_axis(lambdas, idx, axis=-2)[..., 0, :]

    c_k = lambdas_k / (2 * np.pi * (1 - jnp.exp(-2 * lambdas_k)))

    r1 = jax.random.uniform(k1, base_shape + (1,))
    r2 = jax.random.uniform(k2, base_shape + (1,))
    theta = jnp.arccos(
        1.0 / lambdas_k
        * jnp.log(jnp.clip(1 - lambdas_k * r1 / (2 * np.pi * c_k), TINY_NUMBER))
        + 1.0
    )
    phi = 2 * np.pi * r2
    local = jnp.concatenate(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        -1,
    )
    wi = rotate_to_normal(local, xis_k)
    pdf = pdf_fn_mix_sg(wi, normal, None, None, lgtSGs)
    return wi, pdf


def pdf_fn_mix_sg(wi, normal, viewdir, roughness, lgtSGs):
    xis, lambdas, mus, alpha = _sg_mixture_weights(normal, lgtSGs)
    c = lambdas / (2 * np.pi * (1 - jnp.exp(-2.0 * lambdas)))
    dots = jnp.sum(wi[..., None, :] * xis, -1, keepdims=True)
    pdf = alpha * c * jnp.exp(lambdas * (dots - 1))
    return pdf.sum(-2)


# ---------------------------------------------------------------------------
# shared-light fast paths (global [M,7] light, the path tracer's case)
#
# The reference broadcasts lgtSGs to [..., M, 7] and materialises [..., M, 3]
# intermediates (path_tracing_render.py:1412-1418). On TPU we instead phrase
# the mixture evaluation as two [N,M]-shaped matmuls feeding the MXU:
#     E = exp((wi @ xis^T - 1) * lambda)   [N, M]
#     light = E @ mus                      [N, 3]
# — identical numerics, ~3x less memory traffic, and XLA fuses the exp.
# ---------------------------------------------------------------------------

def split_light_sg(lgtSGs: jnp.ndarray):
    """[M,7] -> unit lobes [M,3], |lambda| [M], |mu| [M,3]."""
    xis = lgtSGs[:, :3] / (
        jnp.linalg.norm(lgtSGs[:, :3], axis=-1, keepdims=True) + TINY_NUMBER
    )
    lambdas = jnp.abs(lgtSGs[:, 3])
    mus = jnp.abs(lgtSGs[:, 4:])
    return xis, lambdas, mus


def sg_light_eval(wi: jnp.ndarray, lgtSGs: jnp.ndarray) -> jnp.ndarray:
    """Radiance of the SG mixture along wi: [N,3] x [M,7] -> [N,3]."""
    xis, lambdas, mus = split_light_sg(lgtSGs)
    dots = wi @ xis.T  # [N, M]
    E = jnp.exp((dots - 1.0) * lambdas[None, :])
    return E @ mus


def _shared_alpha(normal: jnp.ndarray, lgtSGs: jnp.ndarray):
    xis, lambdas, mus = split_light_sg(lgtSGs)
    W = normal @ xis.T  # [N, M]
    weight = mus.sum(-1)[None, :] * jnp.clip(W, TINY_NUMBER)
    alpha = weight / weight.sum(-1, keepdims=True)
    return xis, lambdas, alpha


def mix_sg_sampling_shared(key: jax.Array, normal: jnp.ndarray, lgtSGs: jnp.ndarray):
    """mix_sg_sampling for a globally shared light: normal [N,3], lgtSGs [M,7]."""
    N = normal.shape[0]
    xis, lambdas, alpha = _shared_alpha(normal, lgtSGs)

    k0, k1, k2 = jax.random.split(key, 3)
    cdf = jnp.cumsum(alpha, axis=-1)
    cdf = cdf.at[:, -1].set(1.0)
    r0 = jax.random.uniform(k0, (N, 1))
    chosen = jnp.argmax(r0 < cdf, axis=-1)  # [N]

    xis_k = xis[chosen]          # [N, 3]
    lambdas_k = lambdas[chosen][:, None]  # [N, 1]
    c_k = lambdas_k / (2 * np.pi * (1 - jnp.exp(-2 * lambdas_k)))

    r1 = jax.random.uniform(k1, (N, 1))
    r2 = jax.random.uniform(k2, (N, 1))
    theta = jnp.arccos(
        1.0 / lambdas_k
        * jnp.log(jnp.clip(1 - lambdas_k * r1 / (2 * np.pi * c_k), TINY_NUMBER))
        + 1.0
    )
    phi = 2 * np.pi * r2
    local = jnp.concatenate(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        -1,
    )
    wi = rotate_to_normal(local, xis_k)
    pdf = pdf_fn_mix_sg_shared(wi, normal, None, None, lgtSGs)
    return wi, pdf


def pdf_fn_mix_sg_shared(wi, normal, viewdir, roughness, lgtSGs):
    xis, lambdas, alpha = _shared_alpha(normal, lgtSGs)
    c = lambdas / (2 * np.pi * (1 - jnp.exp(-2.0 * lambdas)))  # [M]
    D = jnp.exp((wi @ xis.T - 1.0) * lambdas[None, :])  # [N, M]
    return (alpha * c[None, :] * D).sum(-1, keepdims=True)


# ---------------------------------------------------------------------------
# 2D constant envmap sampling (PBRT infinite-area light)
# ---------------------------------------------------------------------------

def _sample_1d_cdf(key, pdf):
    """pdf [N, L] (normalised so mean-weighted cdf ends at 1) -> index [N]."""
    N, L = pdf.shape
    cdf = jnp.cumsum(pdf / L, axis=1)
    cdf = cdf.at[:, -1].set(1.0)
    r = jax.random.uniform(key, (N, 1))
    return jnp.argmax(r < cdf, axis=1)


def _envmap_distribution(lgtMap: jnp.ndarray):
    H, W, _ = lgtMap.shape
    energy = lgtMap.mean(-1, keepdims=True)  # [H,W,1]
    sin_theta = jnp.sin((jnp.arange(H) + 0.5) / H * np.pi)  # [H]
    dist_f = energy * sin_theta[:, None, None]
    p_uv = dist_f / dist_f.sum() * H * W  # [H,W,1]
    return p_uv


def constant_2d_light_sampling(key: jax.Array, normal: jnp.ndarray, lgtMap: jnp.ndarray):
    """Sample wi proportional to envmap luminance x sin(theta) (reference :291-343).

    Blender convention (z-up equirect), like the reference.
    """
    base_shape = normal.shape[:-1]
    n_flat = int(np.prod(base_shape)) if base_shape else 1
    H, W, _ = lgtMap.shape

    p_uv = _envmap_distribution(lgtMap)  # [H,W,1]
    p_v = p_uv.sum(1) / W  # [H,1]
    p_u_if_v = p_uv / p_v[:, None, :]  # [H,W,1]

    kv, ku = jax.random.split(key)
    p_v_rows = jnp.broadcast_to(p_v[:, 0][None, :], (n_flat, H))
    v_id = _sample_1d_cdf(kv, p_v_rows)  # [n]
    p_u_rows = p_u_if_v[v_id, :, 0]  # [n, W]
    u_id = _sample_1d_cdf(ku, p_u_rows)  # [n]

    v = v_id.astype(jnp.float32) / H
    u = u_id.astype(jnp.float32) / W

    phi = v * np.pi
    theta = np.pi * (1 - u * 2.0)
    x = jnp.cos(theta) * jnp.sin(phi)
    y = jnp.sin(theta) * jnp.sin(phi)
    z = jnp.cos(phi)
    wi = jnp.stack([x, y, z], -1)

    pdf_uv = p_uv[v_id, u_id, 0]
    sin_phi = jnp.sin(phi)
    pdf = jnp.where(sin_phi == 0, 0.0, pdf_uv / (2 * np.pi * np.pi * sin_phi))

    return wi.reshape(base_shape + (3,)), pdf.reshape(base_shape + (1,))


def pdf_fn_constant_2d_light(wi, normal, viewdir, roughness, lgtMap):
    H, W, _ = lgtMap.shape
    p_uv = _envmap_distribution(lgtMap)

    w = wi / jnp.clip(jnp.linalg.norm(wi, axis=-1, keepdims=True), TINY_NUMBER)
    phi = jnp.arccos(jnp.clip(w[..., 2:3], -1.0, 1.0))
    theta = jnp.arctan2(w[..., 1:2], w[..., 0:1])
    u = (1.0 - theta / np.pi) / 2.0
    v = phi / np.pi

    u_id = jnp.clip(jnp.floor(u * W).astype(jnp.int32), 0, W - 1)
    v_id = jnp.clip(jnp.floor(v * H).astype(jnp.int32), 0, H - 1)
    pdf_uv = p_uv[v_id[..., 0], u_id[..., 0]][..., :1]

    sin_phi = jnp.sin(phi)
    return jnp.where(sin_phi == 0, 0.0, pdf_uv / (2 * np.pi * np.pi * sin_phi))


def envmap_lookup(wi: jnp.ndarray, lgtMap: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel radiance lookup, blender convention (reference :1645-1664)."""
    H, W, _ = lgtMap.shape
    w = wi / jnp.clip(jnp.linalg.norm(wi, axis=-1, keepdims=True), TINY_NUMBER)
    phi = jnp.arccos(jnp.clip(w[..., 2:3], -1.0, 1.0))
    theta = jnp.arctan2(w[..., 1:2], w[..., 0:1])
    u = (1.0 - theta / np.pi) / 2.0
    v = phi / np.pi
    u_id = jnp.clip(jnp.floor(u * W).astype(jnp.int32), 0, W - 1)
    v_id = jnp.clip(jnp.floor(v * H).astype(jnp.int32), 0, H - 1)
    return lgtMap[v_id[..., 0], u_id[..., 0], :]


# ---------------------------------------------------------------------------
# multiple importance sampling
# ---------------------------------------------------------------------------

def power_heuristic_list(
    n_list: Sequence[float], pdf_list: Sequence[jnp.ndarray], index: int
) -> jnp.ndarray:
    """Power heuristic (beta=2) over >=2 strategies (reference :390-401)."""
    cur = (n_list[index] * pdf_list[index]) ** 2
    total = sum((n * p) ** 2 for n, p in zip(n_list, pdf_list))
    total = jnp.clip(total, TINY_NUMBER)
    return cur / total
