"""GeometryTrainRunner — Step-1 SDF-from-mesh training.

TPU-native equivalent of the reference training/geometry_train.py:27-447:
regress the ImplicitNetwork onto mesh SDF samples with an L1 loss
(:145, 363-378), single Adam + MultiStep schedule over implicit+rendering
params (:147-151), checkpoint cadence, and periodic visualisation rendering
through the full tracer pipeline (:248-340).

TPU-native design: the SDF sampling (native BVH runtime) runs host-side on a
background thread feeding a small prefetch queue (the reference used 16
dataloader workers, sdf_dataset.py:106-143); the train step is a jitted
sharded regression over the point batch.
"""

from __future__ import annotations

import os
import queue
import shutil
import sys
import threading
from datetime import datetime
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nefii_tpu.config import ConfigFactory, ConfigTree, get_class
from nefii_tpu.datasets.sdf_dataset import SDFDataset
from nefii_tpu.utils import checkpoints as ckpt
from nefii_tpu.utils import general as utils


class GeometryTrainRunner:
    def __init__(self, **kwargs):
        conf = kwargs["conf"]
        self.conf = conf if isinstance(conf, ConfigTree) else ConfigFactory.parse_file(conf)
        self.batch_points = kwargs.get("batch_points", 16384)
        self.max_niters = kwargs.get("max_niters", 800_000)
        self.exps_folder_name = kwargs.get("exps_folder_name", "exps")
        self.expname = kwargs.get("expname") or (
            self.conf.get_string("train.expname", default="geometry") + "_geometry"
        )
        self.seed = kwargs.get("seed", 0)

        from nefii_tpu.parallel import dist

        # rank-0-only filesystem writes (reference idr_train.py:94,695)
        self.is_main = dist.is_main()
        timestamp = kwargs.get("timestamp") or datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        self.rundir = os.path.join(self.exps_folder_name, self.expname, timestamp)
        self.checkpoints_path = os.path.join(self.rundir, "checkpoints")
        self.plots_dir = os.path.join(self.rundir, "plots")
        if self.is_main:
            for d in (self.rundir, self.checkpoints_path, self.plots_dir):
                utils.mkdir_ifnotexists(d)
            conf_path = kwargs["conf"] if isinstance(kwargs["conf"], str) else None
            if conf_path and os.path.exists(conf_path):
                shutil.copy(conf_path, os.path.join(self.rundir, "runconf.conf"))
            with open(os.path.join(self.rundir, "runcmd.txt"), "a") as f:
                f.write(" ".join(sys.argv) + "\n")

        # data: mesh -> sdf sample stream
        self.dataset = SDFDataset(
            kwargs["mesh_path"], self.batch_points, self.max_niters,
            scale_to_unit=kwargs.get("scale_to_unit", True), seed=self.seed,
        )

        # optional scene data for visualisation renders (reference :248-340)
        self.plot_dataset = None
        if kwargs.get("data_split_dir"):
            from nefii_tpu.datasets.scene_dataset import SceneDataset

            self.plot_dataset = SceneDataset(
                kwargs.get("gamma", 1.0), kwargs["data_split_dir"], False,
                kwargs.get("subsample", 1) * kwargs.get("vis_subsample", 1),
                wo_mask=kwargs.get("wo_mask", False),
            )

        model_class = get_class(self.conf.get_string("train.model_class"))
        self.model = model_class.from_conf(self.conf.get_config("model"))
        self.params = self.model.init_params(jax.random.PRNGKey(self.seed))

        lr = self.conf.get_float("train.idr_learning_rate")
        milestones = self.conf.get_list("train.idr_sched_milestones", default=[])
        factor = self.conf.get_float("train.idr_sched_factor", default=0.0)
        sched = (
            optax.piecewise_constant_schedule(lr, {int(m): factor for m in milestones})
            if milestones
            else lr
        )
        # reference optimises implicit+rendering; material untouched
        self.tx = optax.multi_transform(
            {"train": optax.adam(sched), "zero": optax.set_to_zero()},
            param_labels=lambda p: {
                k: jax.tree_util.tree_map(
                    lambda _: "train" if k in ("implicit_network", "rendering_network") else "zero",
                    v,
                )
                for k, v in p.items()
            },
        )
        self.opt_state = self.tx.init(self.params)

        self.start_iter = 0
        if kwargs.get("is_continue"):
            old = kwargs.get("old_expdir") or os.path.join(self.exps_folder_name, self.expname)
            stamps = sorted(os.listdir(old))
            ckdir = os.path.join(old, stamps[-1], "checkpoints")
            self.params, _ = ckpt.load_collection(
                ckdir, ckpt.MODEL, kwargs.get("checkpoint", "latest"), self.params
            )

        self.ckpt_freq = self.conf.get_int("train.ckpt_freq", default=2000)
        self.plot_freq = self.conf.get_int("train.plot_freq", default=2000)
        self.log_freq = kwargs.get("log_freq", 50)

        imp = self.model.implicit_network

        # shard the point batch over the ray mesh with psum'd (num, den) so
        # the sharded L1 (and its gradient) equals single-device exactly —
        # the reference trained Step 1 with DataParallel (geometry_train.py:151)
        from nefii_tpu.parallel.mesh import RAY_AXIS, make_mesh
        from nefii_tpu.parallel.spmd import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = kwargs.get("n_devices") or len(jax.devices())
        requested_dev = n_dev
        while n_dev > 1 and self.batch_points % n_dev != 0:
            n_dev -= 1
        if n_dev != requested_dev:
            print(f"geometry_train: batch_points={self.batch_points} not divisible "
                  f"by {requested_dev} devices; using a {n_dev}-device mesh "
                  "(pick a divisible batch_points to use every device)")
        self.mesh = make_mesh(n_dev)

        def local_step(params, opt_state, pts, sdf_gt):
            def loss_fn(p):
                pred = imp(p["implicit_network"], pts)[:, 0:1]
                num = jax.lax.psum(jnp.abs(pred - sdf_gt).sum(), RAY_AXIS)
                den = jax.lax.psum(jnp.float32(pred.size), RAY_AXIS)
                return num / den

            # psum inside the loss makes it a global scalar; shard_map AD
            # transposes it so grads are already the replicated global grad
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        sharded = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=(P(), P(), P()),
        )
        self._step = jax.jit(sharded, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def save_checkpoints(self, it: int):
        if not self.is_main:
            return
        for tag in (str(it), "latest"):
            ckpt.save_collection(
                self.checkpoints_path, ckpt.MODEL, tag, self.params, {"epoch": it}
            )

    # ------------------------------------------------------------------
    def _producer(self, q: "queue.Queue", n_iters: int):
        for i in range(self.start_iter, n_iters):
            q.put(self.dataset[i])
        q.put(None)

    def run(self, n_iters: int = None):
        n_iters = n_iters or self.max_niters
        q: "queue.Queue" = queue.Queue(maxsize=4)
        t = threading.Thread(target=self._producer, args=(q, n_iters), daemon=True)
        t.start()

        it = self.start_iter
        while True:
            item = q.get()
            if item is None:
                break
            pts, sdf_gt = item
            from jax.sharding import PartitionSpec as P

            from nefii_tpu.parallel import dist
            from nefii_tpu.parallel.mesh import RAY_AXIS

            # global placement: every host draws the same deterministic
            # sample stream and contributes its addressable shard
            pts_g = dist.make_global_array(self.mesh, pts, P(RAY_AXIS))
            sdf_g = dist.make_global_array(self.mesh, sdf_gt, P(RAY_AXIS))
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, pts_g, sdf_g
            )
            if it % self.ckpt_freq == 0:
                self.save_checkpoints(it)
            if self.plot_dataset is not None and it > 0 and it % self.plot_freq == 0:
                self.vis(it)
            if it % self.log_freq == 0:
                lv = float(loss)
                if not np.isfinite(lv):
                    print("[WARNING] NaN in geometry loss — checkpoint and exit")
                    self.save_checkpoints(it)
                    return
                print(f"geometry [{it}/{n_iters}]: l1 = {lv:.6f}")
            it += 1

        self.save_checkpoints(it)

    # ------------------------------------------------------------------
    def vis(self, it: int, img_idx: int = 0):
        """Render normals + depth of the current SDF through the tracer
        (reference geometry_train vis_train :248-340)."""
        if not self.is_main:
            return
        import imageio.v2 as imageio
        import jax.numpy as jnp

        from nefii_tpu.parallel import dist
        from nefii_tpu.utils.camera import get_camera_params
        from nefii_tpu.utils.plots import depth_map

        ds = self.plot_dataset
        H, W = ds.img_res
        idx, sample, _ = ds[img_idx]
        uv = jnp.asarray(sample["uv"][None], jnp.float32)
        pose = jnp.asarray(sample.get("pose", ds.pose_all[img_idx])[None])
        K = jnp.asarray(sample["intrinsics"][None])
        rays, cam = get_camera_params(uv, pose, K)

        imp = self.model.implicit_network
        # rank-0-only render: use a collective-free local replica of the
        # (replicated) params — tracing through globally-sharded arrays from
        # one process alone would raise or deadlock the other ranks
        p_imp = dist.local_replica(self.params["implicit_network"])
        res = self.model.ray_tracer(
            lambda x: imp.sdf(p_imp, x), cam,
            jnp.asarray(sample["object_mask"]), rays,
        )
        g = imp.gradient(p_imp, res.points)
        normals = np.asarray(g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-6))
        hit = np.asarray(res.object_mask)

        normal_img = np.where(hit[:, None], (normals + 1) / 2, 1.0).reshape(H, W, 3)
        depth_img = depth_map(np.asarray(res.points), np.asarray(pose[0]), hit, (H, W))
        panel = np.concatenate([normal_img, depth_img], axis=1)
        imageio.imwrite(
            os.path.join(self.plots_dir, f"geo_{it}.png"),
            (np.clip(panel, 0, 1) * 255).astype(np.uint8),
        )
