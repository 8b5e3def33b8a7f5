"""Evaluation CLI — the `ov_eval` binaries as one tool.

Subcommands mirror the reference's executables
(`ov_eval/cmake/ROS1.cmake:90-187`):

    error_singlerun  <align> <est.txt> <gt.txt>   (ATE + RPE table)
    error_dataset    <align> <gt.txt> <est1.txt> [est2 ...]
    error_comparison <align> <gt.txt> <method1.txt> <method2.txt> ...
    plot_trajectories ... (prints stats; plotting left to the user)

Trajectory files are TUM format `t x y z qx qy qz qw` with JPL q_GtoI,
the format the reference records (`ROS1Visualizer.cpp:117-143`).

Usage: python -m uvio_tpu.eval.cli error_singlerun se3 est.txt gt.txt
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .traj import ate, load_tum, rpe

SEGMENTS = (8, 16, 24, 32, 40)  # error_singlerun.cpp:134


def _print_run(name, est_path, gt_path, align):
    t_e, q_e, p_e = load_tum(est_path)
    t_g, q_g, p_g = load_tum(gt_path)
    res = ate(t_e, q_e, p_e, t_g, q_g, p_g, method=align)
    print(f"[{name}] matched poses: {res['n']}  (alignment: {align})")
    print(
        f"  ATE: rmse_pos = {res['rmse_pos']:.4f} m | rmse_ori = "
        f"{res['rmse_ori_deg']:.4f} deg | mean_pos = {res['mean_pos']:.4f} m"
    )
    r = rpe(t_e, q_e, p_e, t_g, q_g, p_g, segment_lengths=SEGMENTS)
    for L, v in r.items():
        print(
            f"  RPE {L:3d} m: rmse_pos = {v['rmse_pos']:.4f} m | "
            f"rmse_ori = {v['rmse_ori_deg']:.4f} deg | n = {v['n']}"
        )
    return res


def main(argv=None):
    ap = argparse.ArgumentParser(prog="uvio_tpu.eval")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("error_singlerun")
    p1.add_argument("align", choices=["none", "posyaw", "se3", "sim3"])
    p1.add_argument("est")
    p1.add_argument("gt")

    p2 = sub.add_parser("error_dataset")
    p2.add_argument("align", choices=["none", "posyaw", "se3", "sim3"])
    p2.add_argument("gt")
    p2.add_argument("runs", nargs="+")

    p3 = sub.add_parser("error_comparison")
    p3.add_argument("align", choices=["none", "posyaw", "se3", "sim3"])
    p3.add_argument("gt")
    p3.add_argument("methods", nargs="+")

    args = ap.parse_args(argv)

    if args.cmd == "error_singlerun":
        _print_run("singlerun", args.est, args.gt, args.align)
    elif args.cmd == "error_dataset":
        rms = []
        for run in args.runs:
            res = _print_run(run, run, args.gt, args.align)
            rms.append(res["rmse_pos"])
        print(
            f"[dataset] runs = {len(rms)} | mean rmse = {np.mean(rms):.4f} m "
            f"| std = {np.std(rms):.4f} m"
        )
    elif args.cmd == "error_comparison":
        for m in args.methods:
            _print_run(m, m, args.gt, args.align)
    return 0


if __name__ == "__main__":
    sys.exit(main())
