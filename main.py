"""Training entry point (the reference main.py, with a real CLI).

    python main.py --cfg configs/fast_pose.yaml [--resume]

One SPMD solver covers the reference's DP and DDP paths; on a multi-host TPU
pod, launch one process per host with --multihost.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description="simple_pose_tpu trainer")
    ap.add_argument("--cfg", default="configs/fast_pose.yaml")
    ap.add_argument("--resume", action="store_true", help="resume from <weight_path>/<type>_last")
    ap.add_argument("--multihost", action="store_true", help="jax.distributed.initialize first")
    args = ap.parse_args()

    if args.multihost:
        from simple_pose_tpu.parallel.distributed import init_multihost

        print(init_multihost())

    from simple_pose_tpu.train.solver import PoseSolver
    from simple_pose_tpu.utils.misc import rand_seed

    rand_seed(1024)
    solver = PoseSolver(args.cfg)
    solver.run(resume=args.resume)


if __name__ == "__main__":
    main()
