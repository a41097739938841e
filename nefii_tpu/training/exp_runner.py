"""CLI entry point for Step-2 training.

Mirrors the reference training/exp_runner.py:12-124 flag-for-flag (GPU
selection flags become no-ops on the TPU mesh; `--local_rank` is accepted for
script compatibility but the mesh replaces process-level ranks).

Usage:
    python -m nefii_tpu.training.exp_runner --conf confs/conf.conf \
        --data_split_dir <scene> [--wo_mask] [--geometry ckpt.pth] ...
"""

from __future__ import annotations

import argparse


def add_argument(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--conf", type=str, default="")
    parser.add_argument("--data_split_dir", type=str, default="")
    parser.add_argument("--data_split_dir_test", type=str, default="")
    parser.add_argument("--gamma", type=float, default=1.0,
                        help="inverse gamma correction coefficient")
    parser.add_argument("--subsample", type=float, default=1.0)
    parser.add_argument("--vis_subsample", type=float, default=1.0)
    parser.add_argument("--coordinate_type", type=str, default="mitsuba",
                        help='up-axis convention ["mitsuba"/"blender"]')
    parser.add_argument("--wo_mask", default=False, action="store_true")

    parser.add_argument("--geometry", type=str, default="",
                        help="path to pretrained geometry (.pth or ckpt dir)")
    parser.add_argument("--geometry_neus", type=str, default="",
                        help="path to a NeuS checkpoint (sdf_network_fine)")
    parser.add_argument("--freeze_geometry", default=False, action="store_true")
    parser.add_argument("--freeze_decompose_render", default=False, action="store_true")
    parser.add_argument("--freeze_light", default=False, action="store_true")
    parser.add_argument("--freeze_diffuse", default=False, action="store_true")
    parser.add_argument("--roughness_warmup", type=int, default=-1)
    parser.add_argument("--specular_warmup", type=int, default=-1)
    parser.add_argument("--secondary_train_interval", type=int, default=-1)

    parser.add_argument("--train_cameras", default=False, action="store_true")

    parser.add_argument("--exps_folder_name", type=str, default="../exp")
    parser.add_argument("--expname", type=str, default="")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--secondary_batch_size", type=int, default=1)
    parser.add_argument("--memory_capacity_level", type=int, default=18,
                        help="up to 2^level rays in flight across the mesh")
    parser.add_argument("--nepoch", type=int, default=2000)
    parser.add_argument("--max_niter", type=int, default=200001)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--old_expdir", type=str, default="")
    parser.add_argument("--timestamp", default="latest", type=str)
    parser.add_argument("--checkpoint", default="latest", type=str)
    parser.add_argument("--gpu", type=str, default="auto",
                        help="accepted for script compatibility; unused on TPU")

    parser.add_argument("--freeze_idr", default=False, action="store_true")
    parser.add_argument("--write_idr", default=False, action="store_true")

    parser.add_argument("--pretrain_geometry_path", type=str, default="")
    parser.add_argument("--pretrain_idr_rendering_path", type=str, default="")
    parser.add_argument("--pretrain_diffuse_path", type=str, default="")
    parser.add_argument("--light_sg_path", type=str, default="")

    parser.add_argument("--local_rank", type=int, default=-1)
    # multi-host (multi-process) execution — the reference's
    # torch.distributed.launch + NCCL path (idr_train.py:28-40). With
    # --multihost alone, jax.distributed.initialize auto-detects the cluster
    # (TPU pod metadata / JAX_COORDINATOR_ADDRESS env); the explicit flags
    # mirror torch's --master_addr/--nproc/--node_rank for manual launches.
    parser.add_argument("--multihost", default=False, action="store_true",
                        help="initialise jax.distributed before training")
    parser.add_argument("--coordinator_address", type=str, default="")
    parser.add_argument("--num_processes", type=int, default=-1)
    parser.add_argument("--process_id", type=int, default=-1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of the first train "
                             "iterations to this directory")
    return parser


def main(argv=None):
    from nefii_tpu.training.trainer import IDRTrainRunner

    parser = argparse.ArgumentParser()
    parser = add_argument(parser)
    opt = parser.parse_args(argv)

    if opt.multihost:
        from nefii_tpu.parallel import dist

        dist.initialize(
            coordinator_address=opt.coordinator_address or None,
            num_processes=opt.num_processes if opt.num_processes > 0 else None,
            process_id=opt.process_id if opt.process_id >= 0 else None,
        )

    runner = IDRTrainRunner(
        conf=opt.conf,
        data_split_dir=opt.data_split_dir,
        data_split_dir_test=opt.data_split_dir_test,
        gamma=opt.gamma,
        coordinate_type=opt.coordinate_type,
        wo_mask=opt.wo_mask,
        geometry=opt.geometry,
        geometry_neus=opt.geometry_neus,
        freeze_geometry=opt.freeze_geometry,
        freeze_decompose_render=opt.freeze_decompose_render,
        freeze_light=opt.freeze_light,
        freeze_diffuse=opt.freeze_diffuse,
        train_cameras=opt.train_cameras,
        batch_size=opt.batch_size,
        memory_capacity_level=opt.memory_capacity_level,
        nepochs=opt.nepoch,
        max_niters=opt.max_niter,
        expname=opt.expname,
        exps_folder_name=opt.exps_folder_name,
        is_continue=opt.is_continue,
        old_expdir=opt.old_expdir,
        timestamp=opt.timestamp,
        checkpoint=opt.checkpoint,
        freeze_idr=opt.freeze_idr,
        write_idr=opt.write_idr,
        pretrain_geometry_path=opt.pretrain_geometry_path,
        pretrain_idr_rendering_path=opt.pretrain_idr_rendering_path,
        pretrain_diffuse_path=opt.pretrain_diffuse_path,
        light_sg_path=opt.light_sg_path,
        subsample=opt.subsample,
        vis_subsample=opt.vis_subsample,
        local_rank=opt.local_rank,
        roughness_warmup=opt.roughness_warmup,
        specular_warmup=opt.specular_warmup,
        secondary_batch_size=opt.secondary_batch_size,
        secondary_train_interval=opt.secondary_train_interval,
        seed=opt.seed,
        profile_dir=opt.profile_dir,
    )
    runner.run()


if __name__ == "__main__":
    main()
