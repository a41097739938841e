"""CLI entry point for Step-1 geometry training.

Mirrors the reference training/geometry_train.py:396-447, which extends the
exp_runner parser with mesh/sampling flags.

    python -m nefii_tpu.training.geometry_runner --conf confs/sdf.conf \
        --mesh_path mesh.obj --expname s1_robot --batch_size 16384 \
        --max_niter 800000 [--not_scale_to_unit]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from nefii_tpu.training.exp_runner import add_argument
    from nefii_tpu.training.geometry_trainer import GeometryTrainRunner

    parser = argparse.ArgumentParser()
    parser = add_argument(parser)
    parser.add_argument("--mesh_path", type=str, required=True)
    parser.add_argument("--sample_num", type=int, default=1024,
                        help="accepted for script compatibility")
    parser.add_argument("--num_workers", type=int, default=16,
                        help="accepted for script compatibility (a background "
                             "prefetch thread feeds the native sampler)")
    parser.add_argument("--not_scale_to_unit", default=False, action="store_true")
    opt = parser.parse_args(argv)

    runner = GeometryTrainRunner(
        conf=opt.conf,
        mesh_path=opt.mesh_path,
        batch_points=opt.batch_size,
        max_niters=opt.max_niter,
        exps_folder_name=opt.exps_folder_name,
        expname=opt.expname,
        scale_to_unit=not opt.not_scale_to_unit,
        is_continue=opt.is_continue,
        old_expdir=opt.old_expdir,
        checkpoint=opt.checkpoint,
        seed=opt.seed,
        data_split_dir=opt.data_split_dir,
        gamma=opt.gamma,
        subsample=opt.subsample,
        vis_subsample=opt.vis_subsample,
        wo_mask=opt.wo_mask,
    )
    runner.run()


if __name__ == "__main__":
    main()
