"""rgbdslam CLI: the framework's service-command surface.

Capability parity: the reference's headless ROS service UI + batch driver
(reference: src/ros_service_ui.cpp:55-122 — reset/optimize/save_* commands;
offline batch evaluation openni_listener.cpp:431) becomes subcommands:

  run        process a TUM directory (or synthetic sequence), save outputs
  evaluate   run + the 5-level optimization/pruning evaluation protocol
  synthetic  generate a synthetic RGB-D dataset with ground truth
  ate        evaluate a trajectory file against ground truth
  params     list all parameters with defaults and docs

Parameters are passed as repeated `-p name=value` (same names as the
reference's launch-file options where applicable).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _build_params(pairs):
    from ..config import ParameterServer

    return ParameterServer.from_cli(pairs or [])


def _cam_from_args(args, params):
    from ..core.camera import TUM_DEFAULT, TUM_FR1, TUM_FR2, Intrinsics

    named = {"fr1": TUM_FR1, "fr2": TUM_FR2, "default": TUM_DEFAULT}
    if args.camera in named:
        return named[args.camera]
    fx, fy, cx, cy, w, h = (float(x) for x in args.camera.split(","))
    return Intrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=int(w), height=int(h))


def cmd_run(args):
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    from ..io.tum import TumDataset
    from ..pipeline import SlamPipeline

    params = _build_params(args.param)
    cam = _cam_from_args(args, params)
    pipe = SlamPipeline(cam, params)
    ds = TumDataset.open(args.tum_dir)
    pipe.run_tum(ds, max_frames=args.max_frames)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    gt_stamps = gt_xyz = None
    if ds.groundtruth is not None:
        gt_stamps = ds.groundtruth[:, 0].tolist()
        gt_xyz = ds.groundtruth[:, 1:4]
    if args.evaluate:
        report = pipe.evaluation_protocol(out, gt_stamps=gt_stamps, gt_xyz=gt_xyz)
        print(json.dumps(report.as_dict(), indent=2))
    else:
        pipe.manager.optimize()
        from ..io.tum import write_trajectory

        stamps, poses = pipe.manager.trajectory()
        write_trajectory(out / "estimate.txt", stamps, poses)
        print(json.dumps(pipe.manager.statistics(), indent=2))
    if args.save_clouds:
        n = pipe.save_clouds(out / "cloud.pcd")
        print(f"saved cloud.pcd ({n} points)")
    if args.save_octomap:
        pipe.save_octomap(out / "map.ot")
        print("saved map.ot")
    if args.save_g2o:
        pipe.save_g2o(out / "graph.g2o")
        print("saved graph.g2o")
    if args.save_features:
        pipe.save_features(out / "features.npz")
        print("saved features.npz")
    return 0


def cmd_synthetic(args):
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    from ..core.camera import TUM_DEFAULT, Intrinsics
    from ..io.synthetic import SyntheticWorld, render_sequence, save_as_tum_dataset

    if args.small:
        cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    else:
        cam = TUM_DEFAULT
    world = SyntheticWorld.create(seed=args.seed, cam=cam)
    poses, rgbs, depths = render_sequence(
        world, args.frames, seed=args.seed + 1, depth_noise_sigma=args.depth_noise
    )
    save_as_tum_dataset(args.out, poses, rgbs, depths)
    print(f"wrote {args.frames} frames to {args.out}")
    return 0


def cmd_ate(args):
    from ..eval import evaluate_ate
    from ..io.tum import read_trajectory_file

    est = read_trajectory_file(args.estimate)
    gt = read_trajectory_file(args.groundtruth)
    res = evaluate_ate(est[:, 0], est[:, 1:4], gt[:, 0], gt[:, 1:4],
                       max_difference=args.max_difference)
    print(json.dumps(res.as_dict(), indent=2))
    return 0


def cmd_params(args):
    from ..config.params import PARAM_DEFS

    for d in PARAM_DEFS:
        print(f"{d.name:36s} {d.default!r:14} {d.doc}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rgbdslam", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run SLAM on a TUM directory")
    runp.add_argument("--tum-dir", required=True)
    runp.add_argument("--out", required=True)
    runp.add_argument("--camera", default="default",
                      help="fr1|fr2|default or fx,fy,cx,cy,w,h")
    runp.add_argument("--max-frames", type=int, default=None)
    runp.add_argument("-p", "--param", action="append", metavar="K=V")
    runp.add_argument("--evaluate", action="store_true",
                      help="run the 5-level evaluation protocol")
    runp.add_argument("--save-clouds", action="store_true")
    runp.add_argument("--save-octomap", action="store_true")
    runp.add_argument("--save-g2o", action="store_true")
    runp.add_argument("--save-features", action="store_true")
    runp.set_defaults(fn=cmd_run)

    synp = sub.add_parser("synthetic", help="generate a synthetic TUM dataset")
    synp.add_argument("--out", required=True)
    synp.add_argument("--frames", type=int, default=60)
    synp.add_argument("--seed", type=int, default=0)
    synp.add_argument("--depth-noise", type=float, default=0.0)
    synp.add_argument("--small", action="store_true", help="160x120 frames")
    synp.set_defaults(fn=cmd_synthetic)

    atep = sub.add_parser("ate", help="evaluate trajectory vs ground truth")
    atep.add_argument("estimate")
    atep.add_argument("groundtruth")
    atep.add_argument("--max-difference", type=float, default=0.02)
    atep.set_defaults(fn=cmd_ate)

    parp = sub.add_parser("params", help="list parameters")
    parp.set_defaults(fn=cmd_params)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
