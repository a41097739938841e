"""EnvmapMaterialNetwork — all appearance parameters.

TPU-native equivalent of the reference EnvmapMaterialNetwork
(model/sg_envmap_material.py:46-447):
  * light: mixture of M spherical Gaussians `lgtSGs` [M,7] (lobe, lambda, mu)
    with fibonacci-sphere lobe init and energy normalisation (:126-157), or a
    2D constant envmap [M,M,3] (:158-163), or white light [M,5];
  * spatially-varying diffuse-albedo MLP (ELU) with positional encoding and
    optional geometry feature input; `same_mlp` emits albedo+roughness
    (+specular) from one head (:90-103, 369-377);
  * roughness / specular as global params, per-lobe params, or MLPs
    (:165-228), with the Filament roughness floor 0.089 (:400-405) and
    specular remap 0.16*s^2 (:440-447);
  * blending-weight MLP for K>1 base materials (:230-238);
  * optional delta-normal correction MLP (:319-355).

Runtime switches (`fake_roughness`/`fake_specular` warmups, :277-281,407-411)
are forward arguments here (static Python bools — they flip twice per run).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nefii_tpu.models.embedder import get_embedder
from nefii_tpu.models.mlp import apply_linear, torch_default_linear

TINY_ROUGHNESS = 0.089


def fibonacci_sphere(samples: int) -> np.ndarray:
    """Evenly distribute `samples` points on the unit sphere (golden angle)."""
    phi = np.pi * (3.0 - np.sqrt(5.0))
    i = np.arange(samples, dtype=np.float64)
    y = 1 - (i / float(samples - 1)) * 2
    radius = np.sqrt(1 - y * y)
    theta = phi * i
    x = np.cos(theta) * radius
    z = np.sin(theta) * radius
    return np.stack([x, y, z], axis=-1)


def compute_energy(lgtSGs: jnp.ndarray) -> jnp.ndarray:
    """Total energy of each SG lobe: mu * 2pi/lambda * (1 - exp(-2 lambda))."""
    lgt_lambda = jnp.abs(lgtSGs[:, 3:4])
    lgt_mu = jnp.abs(lgtSGs[:, 4:])
    return lgt_mu * 2.0 * np.pi / lgt_lambda * (1.0 - jnp.exp(-2.0 * lgt_lambda))


def _mlp_init(key: jax.Array, dims_in: int, hidden: Tuple[int, ...], dims_out: int):
    layers = []
    d = dims_in
    for h in hidden:
        key, sub = jax.random.split(key)
        layers.append(torch_default_linear(sub, d, h))
        d = h
    key, sub = jax.random.split(key)
    layers.append(torch_default_linear(sub, d, dims_out))
    return layers


def _mlp_apply(layers, x, final_activation=None):
    for l, layer in enumerate(layers):
        x = apply_linear(layer, x)
        if l < len(layers) - 1:
            x = jax.nn.elu(x)
    if final_activation is not None:
        x = final_activation(x)
    return x


@dataclass(frozen=True)
class EnvmapMaterialNetwork:
    multires: int = 0
    dims: Tuple[int, ...] = (256, 256, 256)
    white_specular: bool = False
    white_light: bool = False
    num_lgt_sgs: int = 32
    num_base_materials: int = 2
    upper_hemi: bool = False
    fix_specular_albedo: bool = False
    specular_albedo: Tuple[float, ...] = (-1.0, -1.0, -1.0)
    init_specular_reflectance: float = -1.0
    correct_normal: bool = False
    roughness_mlp: bool = False
    specular_mlp: bool = False
    same_mlp: bool = False
    dims_roughness: Tuple[int, ...] = (256, 256, 256)
    dims_specular: Tuple[int, ...] = (256, 256, 256)
    feature_vector_size: int = 0
    use_normal: bool = False
    light_type: str = "sg"

    def __post_init__(self):
        for name in ("dims", "dims_roughness", "dims_specular", "specular_albedo"):
            object.__setattr__(self, name, tuple(getattr(self, name)))

    # ------------------------------------------------------------------
    @property
    def _input_dim(self) -> int:
        _, input_dim = get_embedder(self.multires, 3)
        input_dim += self.feature_vector_size
        if self.use_normal:
            input_dim += 3
        return input_dim

    @property
    def _diffuse_out_dim(self) -> int:
        dim_o = 3
        if self.roughness_mlp and self.same_mlp:
            dim_o += 1
        if not self.fix_specular_albedo and self.specular_mlp and self.same_mlp:
            dim_o += 1
        return dim_o

    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        input_dim = self._input_dim

        key, sub = jax.random.split(key)
        params["diffuse_albedo_layers"] = _mlp_init(
            sub, input_dim, self.dims, self._diffuse_out_dim
        )

        if self.correct_normal:
            key, sub = jax.random.split(key)
            params["delta_normal_layers"] = _mlp_init(sub, input_dim, self.dims, 2)

        # ---- light ----------------------------------------------------
        key, sub = jax.random.split(key)
        M = self.num_lgt_sgs
        if self.light_type == "sg":
            ncols = 5 if self.white_light else 7
            lgt = jax.random.normal(sub, (M, ncols), jnp.float32)
            if not self.white_light:
                lgt = lgt.at[:, -2:].set(jnp.tile(lgt[:, -3:-2], (1, 2)))
            lgt = lgt.at[:, 3:4].set(20.0 + jnp.abs(lgt[:, 3:4] * 100.0))
            if self.white_light:
                energy = jnp.abs(lgt[:, 4:]) * 2.0 * np.pi / jnp.abs(lgt[:, 3:4]) * (
                    1.0 - jnp.exp(-2.0 * jnp.abs(lgt[:, 3:4]))
                )
                lgt = lgt.at[:, 4:].set(
                    jnp.abs(lgt[:, 4:]) / jnp.sum(energy, axis=0, keepdims=True) * 2.0 * np.pi
                )
            else:
                energy = compute_energy(lgt)
                lgt = lgt.at[:, 4:].set(
                    jnp.abs(lgt[:, 4:]) / jnp.sum(energy, axis=0, keepdims=True) * 2.0 * np.pi
                )
            lobes = jnp.asarray(fibonacci_sphere(M), jnp.float32)
            lgt = lgt.at[:, :3].set(lobes)
            if self.upper_hemi:
                lgt = self._restrict_lobes_upper(lgt)
            params["lgtSGs"] = lgt
        else:
            params["lgtSGs"] = jnp.abs(jax.random.normal(sub, (M, M, 3), jnp.float32))

        # ---- specular ---------------------------------------------------
        K = self.num_base_materials
        if self.fix_specular_albedo:
            assert K == 1
            spec = np.asarray(self.specular_albedo, np.float32).reshape(K, 3)
            assert np.all((spec > 0.0) & (spec < 1.0))
            params["specular_reflectance"] = jnp.asarray(spec)
        elif not self.specular_mlp:
            key, sub = jax.random.split(key)
            cols = 1 if self.white_specular else 3
            spec = jnp.abs(jax.random.normal(sub, (K, cols), jnp.float32))
            if self.init_specular_reflectance > 0:
                spec = jnp.full_like(
                    spec, np.log(1.0 / (1.0 - self.init_specular_reflectance) - 1.0)
                )
            params["specular_reflectance"] = spec
        elif not self.same_mlp:
            key, sub = jax.random.split(key)
            out_dim = 1 if self.white_specular else 3
            params["specular_layers"] = _mlp_init(sub, input_dim, self.dims_specular, out_dim)

        # ---- roughness ---------------------------------------------------
        if not self.roughness_mlp:
            key, sub = jax.random.split(key)
            if K > 1:
                rough = jax.random.uniform(sub, (K, 1), jnp.float32, -1.5, 2.0)
            else:
                rough = jax.random.uniform(sub, (K, 1), jnp.float32, 1.5, 2.0)
            params["roughness"] = rough
        elif not self.same_mlp:
            key, sub = jax.random.split(key)
            params["roughness_layers"] = _mlp_init(sub, input_dim, self.dims_roughness, 1)

        # ---- blending weights (K > 1) -------------------------------------
        if K > 1:
            key, sub = jax.random.split(key)
            params["blending_weights_layers"] = _mlp_init(sub, input_dim, (256, 256, 256), K)

        return params

    # ------------------------------------------------------------------
    @staticmethod
    def _restrict_lobes_upper(lgtSGs: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [lgtSGs[..., :1], jnp.abs(lgtSGs[..., 1:2]), lgtSGs[..., 2:]], axis=-1
        )

    def get_lgtSGs(self, params: Dict[str, Any]) -> jnp.ndarray:
        lgtSGs = params["lgtSGs"]
        if self.light_type == "sg":
            if lgtSGs.shape[-1] == 5:  # white light stored as [M,5]
                lgtSGs = jnp.concatenate(
                    [lgtSGs, lgtSGs[..., -1:], lgtSGs[..., -1:]], axis=-1
                )
            if self.upper_hemi:
                lgtSGs = self._restrict_lobes_upper(lgtSGs)
        else:
            lgtSGs = jnp.abs(lgtSGs)
        return lgtSGs

    @staticmethod
    def specular_remap(s: jnp.ndarray) -> jnp.ndarray:
        """Filament f0 remap: f0 = 0.16 * reflectance^2."""
        return 0.16 * s**2

    @staticmethod
    def specular_inv_remap(s: jnp.ndarray) -> jnp.ndarray:
        return (s / 0.16) ** 0.5

    # ------------------------------------------------------------------
    def _embed_input(self, points, feature_vector, normal):
        embed_fn, _ = get_embedder(self.multires, 3)
        x = embed_fn(points) if self.multires > 0 else points
        if feature_vector is not None:
            x = jnp.concatenate([x, feature_vector], axis=-1)
        if self.use_normal and normal is not None:
            x = jnp.concatenate([x, normal], axis=-1)
        return x

    def apply_correct_normal(
        self, params: Dict[str, Any], n: jnp.ndarray, points: jnp.ndarray
    ) -> jnp.ndarray:
        """Delta-normal correction (reference sg_envmap_material.py:319-355)."""
        if not self.correct_normal:
            return n
        embed_fn, _ = get_embedder(self.multires, 3)
        x = embed_fn(points) if self.multires > 0 else points
        ang = _mlp_apply(params["delta_normal_layers"], x)
        theta = jax.nn.sigmoid(ang[..., 0:1]) * np.pi * 0.5
        phi = jnp.tanh(ang[..., 1:2]) * np.pi

        z = jnp.cos(theta)
        y = jnp.sin(theta) * jnp.sin(phi)
        x3 = jnp.sin(theta) * jnp.cos(phi)
        xyz = jnp.concatenate([x3, y, z], axis=-1)

        x_axis = jnp.zeros_like(n).at[..., 0].set(1.0)
        y_axis = jnp.zeros_like(n).at[..., 1].set(1.0)
        vup = jnp.where(n[..., 0:1] > 0.9, y_axis, x_axis)
        t = jnp.cross(vup, n)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
        s = jnp.cross(t, n)
        return xyz[..., :1] * t + xyz[..., 1:2] * s + xyz[..., 2:] * n

    def __call__(
        self,
        params: Dict[str, Any],
        points: jnp.ndarray,
        feature_vector: Optional[jnp.ndarray] = None,
        normal: Optional[jnp.ndarray] = None,
        fake_roughness: bool = False,
        fake_specular: bool = False,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        x = self._embed_input(points, feature_vector, normal)

        brdf = _mlp_apply(params["diffuse_albedo_layers"], x)
        diffuse_albedo = jax.nn.sigmoid(brdf[..., :3])
        offset = 3
        roughness = None
        specular_reflectance = None
        if self.roughness_mlp and self.same_mlp:
            roughness = jax.nn.sigmoid(brdf[..., offset : offset + 1])
            offset += 1
        if not self.fix_specular_albedo and self.specular_mlp and self.same_mlp:
            specular_reflectance = jax.nn.sigmoid(brdf[..., offset : offset + 1])
            offset += 1

        if self.num_base_materials > 1:
            blending_weights = jax.nn.softmax(
                _mlp_apply(params["blending_weights_layers"], x), axis=-1
            )
        else:
            blending_weights = None

        if self.fix_specular_albedo:
            # the reference stores the fixed albedo with requires_grad=False
            # (sg_envmap_material.py:171-172) — cut the gradient so training
            # can never drift the "fixed" value
            specular_reflectance = jax.lax.stop_gradient(
                params["specular_reflectance"]
            )
        else:
            if not self.specular_mlp:
                specular_reflectance = jax.nn.sigmoid(params["specular_reflectance"])
            elif not self.same_mlp:
                specular_reflectance = _mlp_apply(
                    params["specular_layers"], x, jax.nn.sigmoid
                )
            if self.white_specular:
                specular_reflectance = jnp.broadcast_to(
                    specular_reflectance,
                    specular_reflectance.shape[:-1] + (3,),
                )

        if not self.roughness_mlp:
            roughness = jax.nn.sigmoid(params["roughness"])
        elif not self.same_mlp:
            roughness = _mlp_apply(params["roughness_layers"], x, jax.nn.sigmoid)

        # Filament roughness floor (fp32 precision; sg_envmap_material.py:400-405)
        roughness = (1 - TINY_ROUGHNESS) * roughness + TINY_ROUGHNESS

        if fake_roughness:
            roughness = 0 * roughness + 0.5
        if fake_specular:
            specular_reflectance = 0 * specular_reflectance + 0.5

        specular_reflectance = self.specular_remap(specular_reflectance)

        return {
            "sg_lgtSGs": self.get_lgtSGs(params),
            "sg_specular_reflectance": specular_reflectance,
            "sg_roughness": roughness,
            "sg_diffuse_albedo": diffuse_albedo,
            "sg_blending_weights": blending_weights,
        }

    def get_base_materials(self, params: Dict[str, Any]):
        """Detached global (roughness [K,1], specular [K,3]) for logging."""
        if not self.roughness_mlp:
            roughness = jax.nn.sigmoid(params["roughness"])
        else:
            roughness = jnp.zeros((1, 1), jnp.float32)
        if self.fix_specular_albedo:
            specular = params["specular_reflectance"]
        elif not self.specular_mlp:
            specular = jax.nn.sigmoid(params["specular_reflectance"])
            if self.white_specular:
                specular = jnp.broadcast_to(specular, (specular.shape[0], 3))
        else:
            specular = jnp.zeros((1, 3), jnp.float32)
        return roughness, specular

    def load_light(self, params: Dict[str, Any], path: str) -> Dict[str, Any]:
        """Replace light params from an .npy fit (reference :293-300)."""
        assert path.endswith(".npy")
        lgt = jnp.asarray(np.load(path), jnp.float32)
        new = dict(params)
        new["lgtSGs"] = lgt
        return new
