"""Hard-sequence synthetic suite (VERDICT r3 #4): the reference's benchmark
table spans degenerate sequences (fr1_360 fast rotation 0.051 m, fr2_pioneer
0.4-0.5 m, fr2_large_no_loop 3 m — test/README:87-101); this repo's accuracy
evidence was one textured-room orbit. This tool renders the stress suite and
runs the full 5-level protocol per sequence, emitting a BASELINE.md-style
table (HARD_SEQUENCES.md) + CSV.

Sequences:
  orbit        the bench baseline (textured room, fr1-class orbit)
  spin360      fr1_360-class near-in-place fast yaw spin (90 deg/s)
  low_texture  three near-featureless walls: the detector ladder fires;
               a second config (use_icp, slow path) measures rescue hit-rate
  depth_holes  specular/absorbing-surface depth dropout + sensor noise
  fr2_scale    (--fr2) 2080-frame long run, fr2_desk-class graph size

Usage:
  python tools/hard_sequences.py [--small] [--fr2] [--out HARD_SEQUENCES.md]
  --small: 160x120, short sequences (CPU-runnable; the heavy test's config)
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    # The env's sitecustomize imports jax before user code, so the
    # JAX_PLATFORMS env var is silently ignored; the config API is the
    # only reliable way to keep this accuracy table off the TPU tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics, TUM_DEFAULT
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
from rgbdslam_v2_tpu.pipeline import SlamPipeline

SMALL_CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                       width=160, height=120)


def build_sequences(cam, small: bool, with_fr2: bool):
    """name -> (poses, rgbs, depths, note). Rendered lazily (dict of
    thunks) so --fr2 is the only config paying the 2080-frame render."""
    n_orbit = 80 if small else 520
    n_spin = 80 if small else 260
    n_tex = 64 if small else 300
    seqs = {}

    def orbit():
        w = SyntheticWorld.create(seed=0, cam=cam)
        return (*render_sequence(w, n_orbit, seed=2, depth_noise_sigma=0.01),
                "bench baseline (fr1-class orbit)")

    def spin360():
        w = SyntheticWorld.create(seed=0, cam=cam)
        traj = w.spin_trajectory(n_spin, seed=2, deg_per_frame=3.0)
        return (*render_sequence(w, n_spin, seed=2, depth_noise_sigma=0.01,
                                 trajectory=traj),
                "fr1_360-class 90 deg/s yaw spin (ref 0.051 m)")

    def low_texture():
        w = SyntheticWorld.create(
            seed=3, cam=cam,
            texture_contrast=(1.0, 0.04, 0.04, 0.04, 1.0, 1.0),
        )
        return (*render_sequence(w, n_tex, seed=4, depth_noise_sigma=0.01),
                "3 near-featureless walls (adjuster ladder / rescue)")

    def depth_holes():
        w = SyntheticWorld.create(seed=5, cam=cam)
        return (*render_sequence(w, n_tex, seed=6, depth_noise_sigma=0.01,
                                 depth_dropout=8 if small else 14),
                "specular depth dropout + noise")

    def dark_stretch():
        # textured world, but the middle 20% of frames are darkened to ~3%
        # contrast (auto-exposure failure / lights-off): feature matching
        # starves there, so the adaptive ladder AND the ICP rescue must
        # carry the trajectory through (depth is unaffected)
        w = SyntheticWorld.create(seed=7, cam=cam)
        poses, rgbs, depths = render_sequence(
            w, n_tex, seed=8, depth_noise_sigma=0.01
        )
        lo, hi = int(0.4 * len(rgbs)), int(0.6 * len(rgbs))
        rgbs = rgbs.copy()
        rgbs[lo:hi] = (rgbs[lo:hi].astype(np.uint16) * 8 // 255).astype(
            np.uint8
        )
        return poses, rgbs, depths, \
            f"frames {lo}-{hi} at ~3% contrast (feature starvation)"

    seqs["orbit"] = orbit
    seqs["spin360"] = spin360
    seqs["low_texture"] = low_texture
    seqs["depth_holes"] = depth_holes
    seqs["dark_stretch"] = dark_stretch
    if with_fr2:
        def fr2_scale():
            w = SyntheticWorld.create(seed=0, cam=cam)
            return (*render_sequence(w, 2080, seed=2,
                                     depth_noise_sigma=0.01),
                    "fr2_desk-class graph size (2080 nodes)")
        seqs["fr2_scale"] = fr2_scale
    return seqs


def protocol_params(small: bool, **over):
    base = dict(
        keep_all_nodes=True,
        observability_threshold=0.5,
        optimizer_skip_step=10,
    )
    if small:
        base.update(
            max_keypoints=256, tpu_max_nodes=128, tpu_max_edges=2048,
            tpu_candidate_batch=4, ransac_iterations=128, min_matches=12,
        )
    else:
        base.update(
            max_keypoints=600, tpu_max_nodes=2304, tpu_max_edges=24576,
            tpu_candidate_batch=8, ransac_iterations=200,
        )
    base.update(over)
    return ParameterServer(base)


def run_sequence(cam, seq, params, out_dir, rescue_counts: bool = False):
    """Run one sequence through the pipeline + 5-level protocol.

    rescue_counts iterates frames manually to count ICP-rescue decisions
    (slow path; reasons recorded per frame in manager.last_decisions)."""
    poses, rgbs, depths, note = seq
    stamps = np.arange(len(rgbs)) / 30.0
    pipe = SlamPipeline(cam, params)
    n_icp = n_frames_icp = 0
    t0 = time.perf_counter()
    if rescue_counts:
        for k in range(len(rgbs)):
            pipe.process_frame(
                rgbs[k], depths[k], float(stamps[k]),
                np.asarray(poses[0], np.float32) if k == 0 else None,
            )
            dec = pipe.manager.last_decisions
            icp = [d for d in dec if d.reason == "icp"]
            n_icp += len(icp)
            n_frames_icp += bool(icp)
    else:
        pipe.run_arrays(rgbs, depths, stamps, gt_poses=np.asarray(poses))
    wall = time.perf_counter() - t0
    rep = pipe.evaluation_protocol(
        out_dir, gt_stamps=list(stamps), gt_xyz=np.asarray(poses)[:, :3, 3]
    )
    stats = rep.statistics
    from rgbdslam_v2_tpu.graph.manager import EDGE_CONST_POSITION

    const_pos = sum(
        1 for t in pipe.manager.edge_types if t == EDGE_CONST_POSITION
    )
    # fast-path retroactive rescues (drain-batched GICP, zero-sync) are
    # counted by the manager; the slow path is counted per-frame above
    n_icp += pipe.manager.n_icp_rescues
    n_frames_icp += pipe.manager.n_icp_rescues
    return dict(
        note=note,
        frames=len(rgbs),
        nodes=stats["nodes"],
        edges=stats["active_edges"],
        const_pos_edges=const_pos,
        ate=rep.ate_rmse,
        fps=len(rgbs) / max(wall, 1e-9),
        duration_s=wall,
        icp_rescue_frames=n_frames_icp,
        icp_rescue_edges=n_icp,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import time)")
    ap.add_argument("--fr2", action="store_true")
    ap.add_argument("--out", default="HARD_SEQUENCES.md")
    ap.add_argument("--eval-dir", default="/tmp/hard_seq_eval")
    args = ap.parse_args()
    cam = SMALL_CAM if args.small else TUM_DEFAULT
    seqs = build_sequences(cam, args.small, args.fr2)
    rows = {}
    for name, thunk in seqs.items():
        print(f"[hard] rendering {name}...", file=sys.stderr)
        seq = thunk()
        print(f"[hard] running {name} ({len(seq[1])} frames)...",
              file=sys.stderr)
        rows[name] = run_sequence(
            cam, seq, protocol_params(args.small),
            Path(args.eval_dir) / name,
        )
        print(f"[hard] {name}: ATE {rows[name]['ate']} "
              f"fps {rows[name]['fps']:.1f}", file=sys.stderr)
        if name == "dark_stretch":
            # second config: fast-path retroactive GICP rescue (the
            # manager's drain-batched _retro_rescue_kernel; bound asserted
            # in tests/test_hard_sequences.py::test_dark_stretch_icp_rescue_fires)
            rows["dark_stretch+icp"] = run_sequence(
                cam, seq,
                protocol_params(
                    args.small, use_icp=True, icp_max_iterations=12,
                ),
                Path(args.eval_dir) / "dark_stretch_icp",
            )
            r = rows["dark_stretch+icp"]
            print(f"[hard] dark_stretch+icp: ATE {r['ate']} rescue on "
                  f"{r['icp_rescue_frames']} frames "
                  f"({r['icp_rescue_edges']} edges)", file=sys.stderr)
        if name == "low_texture":
            # second config: ICP rescue measurement (slow path)
            rows["low_texture+icp"] = run_sequence(
                cam, seq,
                protocol_params(
                    args.small, use_icp=True, icp_max_iterations=12,
                    min_translation_meter=0.001,
                ),
                Path(args.eval_dir) / "low_texture_icp",
                rescue_counts=True,
            )
            r = rows["low_texture+icp"]
            print(f"[hard] low_texture+icp: ATE {r['ate']} rescue on "
                  f"{r['icp_rescue_frames']} frames "
                  f"({r['icp_rescue_edges']} edges)", file=sys.stderr)

    # ---- markdown table -------------------------------------------------
    lines = [
        "# HARD_SEQUENCES — stress-suite ATE table "
        "(synthetic degenerate sequences)",
        "",
        f"Camera {cam.width}x{cam.height}; 5-level protocol "
        "(openni_listener.cpp:431 equivalents); ATE RMSE in meters. "
        "Generated by tools/hard_sequences.py"
        + (" --small" if args.small else "") + ".",
        "",
        "| Sequence | Frames | Nodes/Edges | const-pos edges | "
        "L0 | L1 | L2 | L4 | fps | Notes |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in rows.items():
        a = r["ate"]
        extra = r["note"]
        if r["icp_rescue_frames"]:
            extra += (f"; ICP rescue on {r['icp_rescue_frames']} frames/"
                      f"{r['icp_rescue_edges']} edges")
        lines.append(
            f"| {name} | {r['frames']} | {r['nodes']}/{r['edges']} "
            f"| {r['const_pos_edges']} "
            f"| {a.get(0, float('nan')):.4f} | {a.get(1, float('nan')):.4f} "
            f"| {a.get(2, float('nan')):.4f} | {a.get(4, float('nan')):.4f} "
            f"| {r['fps']:.1f} | {extra} |"
        )
    lines.append("")
    Path(args.out).write_text("\n".join(lines))
    print(f"[hard] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
