"""Novel-view decomposition rendering.

Equivalent of the reference scripts/render.py:30-497: restore a checkpoint,
render the test split at full resolution with multi-ray anti-aliasing
(`--num_rays 256`), and write per-view EXRs — gt, rerender_rgb, diffuse_rgb,
specular_rgb, diffuse_albedo, roughness, specular_reflection — plus a
stacked preview png and envmap.exr.

TPU-native: instead of DDP ray-shard scatter + pickled gather_object
(reference :283-356), rays are chunked into fixed-size batches and each
chunk runs through the shard-mapped eval forward over the device mesh; chunk
outputs are reassembled host-side in order (no remapping needed — shapes are
static).

    python -m nefii_tpu.scripts.render --conf confs/conf.conf \
        --data_split_dir <scene_test> --old_expdir exps/robot \
        --timestamp latest --num_rays 256
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def add_argument(parser):
    from nefii_tpu.training.exp_runner import add_argument as base_args

    parser = base_args(parser)
    parser.add_argument("--num_rays", type=int, default=64,
                        help="anti-aliasing rays per pixel")
    parser.add_argument("--no_auto_budget", action="store_true",
                        help="disable compaction-budget auto-sizing: render "
                             "every chunk with the conf's budgets (dense by "
                             "default). With auto-sizing (the default), one "
                             "pixel-strided probe chunk measures per-path "
                             "demand and every budget is sized from it with "
                             "margin; any chunk whose overflow counters fire "
                             "is re-rendered with escalated budgets, so the "
                             "output EXRs are exact either way")
    parser.add_argument("--out_dir", type=str, default="")
    parser.add_argument("--max_views", type=int, default=-1)
    parser.add_argument("--envmap_size", type=int, nargs=2, default=[256, 512])
    parser.add_argument("--export_mesh_resolution", type=int, default=0,
                        help="when > 0, also export the high-res geometry "
                             "via the two-stage coarse-to-fine extraction "
                             "(reference utils/plots.py:169-241) with this "
                             "many samples on the shortest bbox axis")
    return parser


class RenderRunner:
    def __init__(self, **kwargs):
        import jax

        from nefii_tpu.config import ConfigFactory, ConfigTree, get_class
        from nefii_tpu.parallel.mesh import make_mesh
        from nefii_tpu.utils import checkpoints as ckpt

        conf = kwargs["conf"]
        self.conf = conf if isinstance(conf, ConfigTree) else ConfigFactory.parse_file(conf)
        self.num_rays = kwargs.get("num_rays", 64)
        self.memory_capacity_level = kwargs.get("memory_capacity_level", 18)
        self.coordinate_type = kwargs.get("coordinate_type", "mitsuba")

        dataset_class = get_class(self.conf.get_string("train.dataset_class"))
        self.dataset = dataset_class(
            kwargs.get("gamma", 1.0), kwargs["data_split_dir"], False,
            kwargs.get("subsample", 1), wo_mask=kwargs.get("wo_mask", False),
        )

        model_class = get_class(self.conf.get_string("train.model_class"))
        self.model = model_class.from_conf(self.conf.get_config("model"))
        self.mesh = make_mesh()
        self.world_size = self.mesh.devices.size

        self.params = self.model.init_params(jax.random.PRNGKey(0))
        expdir = kwargs.get("old_expdir") or os.path.join(
            kwargs.get("exps_folder_name", "exps"),
            kwargs.get("expname") or self.conf.get_string("train.expname", default="default"),
        )
        timestamp = kwargs.get("timestamp", "latest")
        if timestamp == "latest" and os.path.isdir(expdir):
            stamps = sorted(os.listdir(expdir))
            timestamp = stamps[-1]
        ckdir = os.path.join(expdir, timestamp, "checkpoints")
        self.params, _ = ckpt.load_collection(
            ckdir, ckpt.MODEL, kwargs.get("checkpoint", "latest"), self.params
        )
        print(f"restored checkpoint from {ckdir}")

        from nefii_tpu.parallel import dist

        # rank-0-only writes in multi-host runs (reference render.py gathers
        # to rank 0 and writes there, scripts/render.py:330-360,407-442)
        self.is_main = dist.is_main()
        # pin the collective context before the first (slow-to-compile)
        # chunk render — see dist.warmup_collectives
        dist.warmup_collectives(self.mesh)
        self.out_dir = kwargs.get("out_dir") or os.path.join(expdir, timestamp, "renders")
        if self.is_main:
            os.makedirs(self.out_dir, exist_ok=True)
        self.envmap_size = tuple(kwargs.get("envmap_size", (256, 512)))
        self.max_views = kwargs.get("max_views", -1)
        self.export_mesh_resolution = kwargs.get("export_mesh_resolution", 0)
        self.auto_budget = not kwargs.get("no_auto_budget", False)
        # the model actually rendered with: auto-sized once on the first
        # view, then escalated in place whenever a chunk's overflow
        # counters fire (budgets learned once stay for the whole run)
        self.render_model = self.model

    # ------------------------------------------------------------------
    def render_view(self, img_idx: int):
        """Full-resolution render of one view with multi-ray AA."""
        import jax
        import jax.numpy as jnp

        from nefii_tpu.parallel import spmd
        from nefii_tpu.utils import general as utils

        ds = self.dataset
        ds.sampling_idx = None
        rng = np.random.default_rng(img_idx)
        ds.change_sampling_rays(self.num_rays if self.num_rays > 1 else -1, rng)
        idx, model_input, ground_truth = ds[img_idx]
        _, model_input, ground_truth = ds.collate([(idx, model_input, ground_truth)])
        ds.change_sampling_rays(-1)

        total = ds.total_pixels
        rays_per_px = max(self.num_rays, 1)
        n_pix = utils.pixels_per_chunk(
            self.memory_capacity_level, rays_per_px, self.world_size
        )
        n_pix = max(min(n_pix, total), self.world_size)
        n_pix -= n_pix % self.world_size

        if "pose" not in model_input:
            model_input = dict(model_input)
            model_input["pose"] = ds.pose_all[img_idx][None]

        from nefii_tpu.models import budgets
        from nefii_tpu.parallel import dist

        rays = rays_per_px if self.num_rays > 1 else 1
        dims = budgets.BudgetDims.for_chunk(
            n_pix // self.world_size, rays, self.model.fast_multi_ray
        )

        def make_batch(chunk):
            batch = {
                "uv": np.asarray(chunk["uv"], np.float32),
                "object_mask": np.asarray(chunk["object_mask"]),
                "intrinsics": np.asarray(chunk["intrinsics"], np.float32),
                "pose": np.asarray(chunk["pose"], np.float32),
            }
            return dist.make_global_batch(self.mesh, batch, spmd.batch_pspec(batch))

        if self.auto_budget and not getattr(self, "_budgets_sized", False):
            self._auto_size_budgets(model_input, total, n_pix, dims, img_idx,
                                    make_batch)

        cache = {}
        overflow = {}

        def forward(chunk):
            batch = make_batch(chunk)
            while True:
                if "fn" not in cache:
                    cache["fn"] = jax.jit(
                        spmd.make_eval_forward(self.render_model, self.mesh)(batch)
                    )
                out = cache["fn"](self.params, batch, jax.random.PRNGKey(img_idx))
                ovf = {k: int(dist.to_host(v)) for k, v in out.items()
                       if k.endswith("_overflow")}
                if not any(ovf.values()):
                    return {k: dist.to_host(v) for k, v in out.items()
                            if not k.endswith("_overflow")}
                # A compaction budget fell short on THIS chunk: escalate the
                # overflowed budgets and re-render the chunk before anything
                # is written — the reference renders dense (scripts/
                # render.py:283-356), so exactness is unconditional here
                # too. Escalation saturates at dense in log2 steps, so the
                # loop terminates; budgets stay raised for later chunks.
                self.render_model, changed = budgets.escalate(
                    self.render_model, ovf, dims.n_primary, dims.n_secondary
                )
                if not changed:
                    # every knob already dense — overflow impossible; keep
                    # the warning path just in case
                    for k, v in ovf.items():
                        overflow[k] = overflow.get(k, 0) + v
                    return {k: dist.to_host(v) for k, v in out.items()
                            if not k.endswith("_overflow")}
                cache.clear()
                if self.is_main:
                    detail = ", ".join(changed)
                    print(f"[auto-budget] view {img_idx}: overflow "
                          f"({ {k: v for k, v in ovf.items() if v} }) — "
                          f"re-rendering chunk with {detail}")

        with self.mesh:
            out = utils.chunked_forward(forward, model_input, total, n_pix)
        if any(overflow.values()) and self.is_main:
            detail = ", ".join(f"{k}={v}" for k, v in overflow.items() if v)
            print(f"[WARNING] view {img_idx}: compaction budget overflow "
                  f"({detail}) — raise ray_tracer budgets for exact output")
        out["gt"] = np.asarray(ground_truth["rgb"][0])
        return out

    def _auto_size_budgets(self, model_input, total, n_pix, dims, img_idx,
                           make_batch):
        """Measure per-path demand on one pixel-strided probe chunk (dense,
        measure_demand=True — models/budgets.probe_model) and size every
        compaction budget from it with margin. Strided pixels make the probe
        representative of the whole view rather than its first rows; the
        escalate-and-retry loop in render_view guarantees exactness for
        chunks whose demand still exceeds the sized budgets."""
        import jax

        from nefii_tpu.models import budgets
        from nefii_tpu.models.idr import DEMAND_KEYS
        from nefii_tpu.parallel import dist, spmd

        idxs = np.unique(
            np.linspace(0, total - 1, n_pix).round().astype(np.int64))
        if len(idxs) < n_pix:  # total < n_pix: keep shapes static
            idxs = np.pad(idxs, (0, n_pix - len(idxs)), mode="edge")
        chunk = {
            k: (np.asarray(v[:, idxs]) if k in ("uv", "object_mask")
                else np.asarray(v))
            for k, v in model_input.items()
        }
        probe = budgets.probe_model(self.model)
        batch = make_batch(chunk)
        with self.mesh:
            fn = jax.jit(spmd.make_eval_forward(probe, self.mesh)(batch))
            out = fn(self.params, batch, jax.random.PRNGKey(img_idx))
            demand = {k: int(dist.to_host(out[k])) for k in DEMAND_KEYS}
        # psum'd global demand -> per-shard (budgets apply to each device's
        # shard; the margin absorbs shard imbalance)
        local = {k: -(-v // self.world_size) for k, v in demand.items()}
        self.render_model = budgets.size_from_demand(self.model, local, dims)
        self._budgets_sized = True
        if self.is_main:
            tr, sec = self.render_model.ray_tracer, \
                self.render_model.secondary_ray_tracer
            print(
                "[auto-budget] sized from probe demand "
                f"{ {k: v for k, v in demand.items() if v} }: "
                f"sampler={tr.sampler_budget} rootfind={tr.rootfind_budget} "
                f"compact={tr.compact_budget} "
                f"sec_sampler={sec.sampler_budget if sec else None} "
                f"sec_compact={sec.compact_budget if sec else None} "
                f"sec_rootfind={sec.rootfind_budget if sec else None} "
                f"shade={self.render_model.shade_fraction:g} "
                f"indirect={self.render_model.indirect_fraction:g} "
                f"cull={self.render_model.secondary_fraction:g}"
            )

    # ------------------------------------------------------------------
    def write_view(self, img_idx: int, out):
        if not self.is_main:
            return
        import imageio.v2 as imageio

        from nefii_tpu.utils import exr as exr_io

        H, W = self.dataset.img_res
        d = self.out_dir

        def img(key):
            v = out[key]
            if v.ndim == 1 or v.shape[-1] == 1:
                v = np.tile(v.reshape(H, W, 1), (1, 1, 3))
            return v.reshape(H, W, 3)

        panels = {
            "gt": img("gt"),
            "rerender_rgb": img("sg_rgb_values"),
            "diffuse_rgb": img("sg_diffuse_rgb_values"),
            "specular_rgb": img("sg_specular_rgb_values"),
            "diffuse_albedo": img("sg_diffuse_albedo_values"),
            "roughness": img("sg_roughness_values"),
            "specular_reflection": img("sg_specular_reflection_values"),
        }
        for name, data in panels.items():
            exr_io.write(os.path.join(d, f"{name}_{img_idx:03d}.exr"), data)

        stack = np.concatenate(
            [np.clip(panels[k], 0, 1) for k in
             ("gt", "rerender_rgb", "diffuse_rgb", "specular_rgb",
              "diffuse_albedo", "roughness")], axis=1,
        )
        imageio.imwrite(
            os.path.join(d, f"render_{img_idx:03d}.png"),
            (stack * 255).astype(np.uint8),
        )

    def write_envmap(self):
        if not self.is_main:
            return
        import jax.numpy as jnp

        from nefii_tpu.ops.sg import compute_envmap
        from nefii_tpu.utils import exr as exr_io

        em = self.model.envmap_material_network
        lgt = em.get_lgtSGs(self.params["envmap_material_network"])
        env = np.asarray(
            compute_envmap(
                jnp.asarray(lgt), *self.envmap_size,
                coordinate_type=self.coordinate_type,
                envmap_type=em.light_type if em.light_type != "sg" else "sg",
            )
        )
        exr_io.write(os.path.join(self.out_dir, "envmap.exr"), env)

    def write_mesh(self):
        """High-res geometry export (reference render-pipeline surface
        artifact, utils/plots.py:169-241). SDF evaluation is host-driven and
        identical on every process; only rank 0 writes."""
        from nefii_tpu.parallel import dist
        from nefii_tpu.utils.mesh_io import save_mesh
        from nefii_tpu.utils.plots import get_surface_high_res_mesh

        p_imp = dist.local_replica(self.params["implicit_network"])
        verts, faces = get_surface_high_res_mesh(
            lambda x: self.model.implicit_network.sdf(p_imp, x),
            resolution=self.export_mesh_resolution,
            bound=self.model.ray_tracer.object_bounding_sphere,
        )
        if self.is_main:
            path = os.path.join(self.out_dir, "surface_high_res.ply")
            save_mesh(path, verts, faces)
            print(f"exported {len(verts)}-vertex mesh to {path}")

    # ------------------------------------------------------------------
    def run(self):
        n = len(self.dataset)
        if self.max_views > 0:
            n = min(n, self.max_views)
        for i in range(n):
            out = self.render_view(i)
            self.write_view(i, out)
            print(f"rendered view {i+1}/{n}")
        self.write_envmap()
        if self.export_mesh_resolution > 0:
            self.write_mesh()
        print("outputs in", self.out_dir)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser = add_argument(parser)
    opt = parser.parse_args(argv)
    runner = RenderRunner(**vars(opt))
    runner.run()


if __name__ == "__main__":
    main()
