"""Batched FULL-SLAM over many sequences — the TPU-added scale axis, done
with the real system, not a VO slice.

The reference evaluates its benchmark sequences serially, one full-system
run per bagfile (reference: test/run_tests.sh:21-76 — every .bag gets the
complete pipeline: features, candidate matching, EMM, pose graph,
5-level protocol). parallel/multi_eval.py covers the embarrassingly
parallel *VO* version of that axis; this module runs the COMPLETE device
step — extract + candidate compare + EMM + on-device accept/commit
(graph/device_step.py) plus batched pose-graph optimization and the
5-level evaluation protocol (openni_listener.cpp:431-518) — for S
sequences at once:

  * batch axis S over every per-sequence state leaf (NodeStore, GraphState,
    ingest buffer, candidate slots, RNG seed) via jax.vmap — S sequences
    cost one device program, MXU-batched;
  * optionally sharded one-shard-per-device over a 1-D mesh (shard_map,
    no collectives: sequences are independent; per-device programs are the
    local vmap) — the multi-chip story for whole-benchmark sweeps:
    8 devices run the 15-sequence TUM suite in ~2 sequences' wall-clock.

Host bookkeeping (candidate selection, adjacency, keyframes, edge-type
accounting) runs per sequence on drained summaries, sharing GraphManager's
own logic via unbound calls on a per-sequence host-state mirror — the
decisions are literally the same code as the single-sequence product path.

Scope: the protocol configuration (keep_all_nodes fast path — the setting
the reference's benchmark harness runs, test/test_settings.launch:26-114).
Appearance retrieval and robot odometry are single-sequence features; the
online optimizer here is the batched full-graph LM with first-node
fixation (the single-sequence 'inaffected' subgraph machinery is
host-incremental and does not batch).
"""
from __future__ import annotations

import functools
import logging
from typing import Dict, List, Optional

logger = logging.getLogger("rgbdslam.parallel")

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.params import ParameterServer, default_params
from ..core.camera import Intrinsics
from ..graph.device_step import StepSummary, _commit_body, _compute_body
from ..graph.manager import (
    EDGE_CONST_POSITION,
    EDGE_LOOP,
    EDGE_SEQUENTIAL,
    GraphManager,
    compact_frame,
)
from ..graph.node_store import NodeStore
from ..models.orb import OrbExtractor
from ..optim.pose_graph import (
    GraphState,
    _optimize_jit,
    edge_chi2,
    make_graph_state,
)


class _SeqHost:
    """Per-sequence host-state mirror: exactly the attributes
    GraphManager.select_candidates / _frame_slots / _geodesic_set read, so
    the shared logic runs UNBOUND on this object — one implementation of
    candidate selection for both the single- and multi-sequence paths."""

    def __init__(self, params, cand_batch: int, seed: int):
        self.params = params
        self.cand_batch = cand_batch
        self.timestamps: List[float] = []
        self.adjacency: Dict[int, set] = {}
        self.keyframes: List[int] = [0]
        self._rng = np.random.default_rng(seed)
        self._retrieval_scores = None  # appearance retrieval: single-seq only
        self.n_nodes = 0
        e_cap = params["tpu_max_edges"]
        self.edge_active_host = np.zeros(e_cap, bool)
        self.edge_i_host = np.full(e_cap, -1, np.int32)
        self.edge_j_host = np.full(e_cap, -1, np.int32)
        self.edge_types: List[int] = []
        self.edge_pairs: List[Optional[tuple]] = []
        self.n_edges = 0
        self.n_loop_edges = 0
        self.n_seq_edges = 0

    def select_candidates(self, new_id: int, kp=None) -> List[int]:
        return GraphManager.select_candidates(self, new_id, kp)

    def frame_slots(self, new_id: int, timestamp: float):
        return GraphManager._frame_slots(self, new_id, timestamp)


def _first_body(
    store: NodeStore,
    graph: GraphState,
    packed,
    pose0,  # (4, 4) ground-truth or identity (firstNode, graph_manager.cpp:360)
    extractor=None,
    cam: Intrinsics = None,
    stride: int = 2,
    ingest_fmt: str = "yc12",
    gray_bits: int = 8,
    depth_bits: int = 12,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
    use_feature_min_depth: bool = False,
    **_unused,
):
    """First node: extract + insert row 0, fixed at pose0."""
    from ..graph.manager import _prepare_and_extract

    kp, depth_small, color_small = _prepare_and_extract(
        extractor, cam, stride, min_depth, max_depth, use_feature_min_depth,
        packed, fmt=ingest_fmt, gray_bits=gray_bits, depth_bits=depth_bits,
    )
    store = store.insert(0, kp, depth_small, color_small)
    graph = graph._replace(
        poses=graph.poses.at[0].set(pose0),
        node_active=graph.node_active.at[0].set(True),
        node_fixed=graph.node_fixed.at[0].set(True),
    )
    return store, graph


def _add_edges_body(graph: GraphState, slots, e_i, e_j, info_scale, active):
    """Batched edge append (protocol const-position replacements)."""
    eye4 = jnp.eye(4, dtype=jnp.float32)
    eye6 = jnp.eye(6, dtype=jnp.float32)
    M = slots.shape[0]
    meas = jnp.broadcast_to(eye4, (M, 4, 4))
    info = info_scale[:, None, None] * eye6
    return graph._replace(
        edge_i=graph.edge_i.at[slots].set(
            jnp.where(active, e_i, graph.edge_i[slots])
        ),
        edge_j=graph.edge_j.at[slots].set(
            jnp.where(active, e_j, graph.edge_j[slots])
        ),
        edge_meas=graph.edge_meas.at[slots].set(
            jnp.where(active[:, None, None], meas, graph.edge_meas[slots])
        ),
        edge_info=graph.edge_info.at[slots].set(
            jnp.where(active[:, None, None], info, graph.edge_info[slots])
        ),
        edge_active=graph.edge_active.at[slots].set(
            active | graph.edge_active[slots]
        ),
    )


class MultiSequenceSlam:
    """S concurrent full-SLAM instances batched on the device (optionally
    sharded over a mesh). Frames advance in lockstep across sequences."""

    # Single-sequence-only features (PARITY.md §2.3): requesting them here
    # warns and force-disables, so the batched path's contract is explicit
    # code, not prose. (name, is_requested, neutral value)
    UNSUPPORTED = (
        ("global_loop_candidates", lambda v: v > 0, 0),  # appearance retrieval
        ("use_robot_odom", bool, False),
        ("use_robot_odom_only", bool, False),
        ("tpu_wire_delta", bool, False),  # serial host-loop wire optimization
        # incremental 'inaffected' fixation needs per-sequence affected-set
        # tracking; the batched optimize uses whole-graph first-fixation
        ("pose_relative_to", lambda v: v == "inaffected", "first"),
    )

    def __init__(
        self,
        cam: Intrinsics,
        n_sequences: int,
        params: Optional[ParameterServer] = None,
        mesh: Optional[Mesh] = None,
        extractor=None,
    ):
        self.params = p = params or default_params()
        for name, requested, neutral in self.UNSUPPORTED:
            if requested(p[name]):
                logger.warning(
                    "MultiSequenceSlam does not support %s (single-sequence "
                    "path only; PARITY.md §2.3); forcing %r", name, neutral
                )
                p.set(name, neutral)
        self.cam = cam
        self.S = S = int(n_sequences)
        self.mesh = mesh
        if mesh is not None and S % mesh.devices.size:
            raise ValueError(
                f"{S} sequences not divisible by {mesh.devices.size} devices"
            )
        self.n_cap = p["tpu_max_nodes"]
        self.e_cap = p["tpu_max_edges"]
        self.cand_batch = B = p["tpu_candidate_batch"]
        self.emm_stride = s = p["cloud_creation_skip_step"]
        self.ingest_fmt = p["tpu_ingest_format"]
        self.gray_bits = p["tpu_gray_bits"]
        self.depth_bits = p["tpu_depth_bits"]
        self.cam_small = Intrinsics(
            fx=cam.fx / s, fy=cam.fy / s, cx=cam.cx / s, cy=cam.cy / s,
            width=cam.width // s, height=cam.height // s,
        )
        if extractor is not None:
            self.extractor = extractor
        else:  # ORB family only (GraphManager handles SIFT fallback logic;
            # pass a SiftExtractor explicitly for batched SIFT sweeps)
            self.extractor = OrbExtractor(
                max_keypoints=p["max_keypoints"],
                fast_threshold=0.06,
                grid=p["detector_grid_resolution"] + 1,
                oriented=p["feature_extractor_type"].upper() != "BRIEF",
            )
        # one GraphManager-identical static config for the device programs
        # (temporal-delta wire coding is a serial host-loop optimization;
        # the batched multi-sequence path ships absolute frames)
        self.wire_delta = False
        self._cfg = dict(GraphManager._step_cfg(self))
        # ---- batched device state (leading axis S) -----------------------
        is_sift = "Sift" in type(self.extractor).__name__
        desc_dim = 128 if is_sift else 256
        desc_dtype = jnp.float32 if is_sift else {
            "int8": jnp.int8, "bf16": jnp.bfloat16, "float32": jnp.float32,
        }[p["tpu_descriptor_dtype"]]
        store1 = NodeStore.create(
            self.n_cap, p["max_keypoints"], desc_dim,
            self.cam_small.height, self.cam_small.width,
            desc_dtype=desc_dtype,
            store_color=p["store_pointclouds"],
            emm_skip=p["emm_skip_step"],
        )
        graph1 = make_graph_state(self.n_cap, self.e_cap)
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S,) + x.shape),
            (store1, graph1),
        )
        if mesh is not None:
            sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            batched = jax.device_put(batched, sh)
        else:
            batched = jax.tree.map(jnp.asarray, batched)
        self.store, self.graph = batched

        # ---- per-sequence host mirrors -----------------------------------
        seed0 = int(p["tpu_seed"])
        self.seq = [_SeqHost(p, B, seed0 + i) for i in range(S)]
        # fast-path RNG per sequence: GraphManager's counter scheme with
        # per-sequence base so sequence i reproduces a single manager with
        # tpu_seed seed0+i bit-for-bit (same fold_in input per frame)
        self._seed_base = np.asarray(
            [(seed0 + i) * 1_000_003 for i in range(S)], np.int64
        )
        self.n_nodes = 0
        self.n_edges = 0
        self._frame_count = 0
        self._pending: List[tuple] = []

        # ---- compiled batched programs -----------------------------------
        compute1 = functools.partial(_compute_body, **self._cfg)
        first1 = functools.partial(
            _first_body, extractor=self._cfg["extractor"], cam=self._cfg["cam"],
            stride=self._cfg["stride"], ingest_fmt=self._cfg["ingest_fmt"],
            gray_bits=self._cfg["gray_bits"],
            depth_bits=self._cfg["depth_bits"],
            min_depth=self._cfg["min_depth"], max_depth=self._cfg["max_depth"],
            use_feature_min_depth=self._cfg["use_feature_min_depth"],
        )
        #               store graph packed nid  pid  cand dup  dt   seed
        self._compute = self._wrap(
            compute1, (0, 0, 0, None, None, 0, 0, 0, 0)
        )
        #               store graph rows pose nid  estart ei ej meas info act
        self._commit = self._wrap(
            _commit_body, (0, 0, 0, 0, None, None, 0, 0, 0, 0, 0),
            donate=(0, 1),
        )
        self._first = self._wrap(first1, (0, 0, 0, 0), donate=(0, 1))
        self._add_edges = self._wrap(
            _add_edges_body, (0, 0, 0, 0, 0, 0), donate=(0,)
        )
        self._chi2 = self._wrap(edge_chi2, (0,))

    # ------------------------------------------------------------------
    def _wrap(self, fn, in_axes, donate=()):
        """vmap over the sequence axis; with a mesh, shard_map(vmap) so each
        device runs its local sequence shard (no collectives — sequences
        are independent)."""
        v = jax.vmap(fn, in_axes=in_axes)
        if self.mesh is None:
            return jax.jit(v, donate_argnums=donate)
        ax = self.mesh.axis_names[0]
        in_specs = tuple(P(ax) if a == 0 else P() for a in in_axes)
        sm = shard_map(
            v, mesh=self.mesh, in_specs=in_specs, out_specs=P(ax),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=donate)

    def _opt_fn(self, iterations: int, pcg_iters: int, solver: str):
        p = self.params
        hd = p["huber_delta"]

        def one(g):
            # jit-of-jit traces inline; statics are Python constants here
            return _optimize_jit(g, iterations, hd, pcg_iters, 1e-4, solver)

        return self._wrap(one, (0,))

    # ------------------------------------------------------------------
    def compact(self, rgb, depth) -> np.ndarray:
        return compact_frame(rgb, depth, self.emm_stride,
                             fmt=self.ingest_fmt, gray_bits=self.gray_bits,
                             depth_bits=self.depth_bits)

    def add_frames(self, compacts, timestamps, gt_poses=None) -> None:
        """One lockstep frame for all S sequences.

        compacts: (S, n_bytes) uint8 (stacked compact_frame outputs);
        timestamps: (S,) float or scalar; gt_poses: optional (S, 4, 4)
        (first frame only, firstNode GT anchoring)."""
        compacts = np.ascontiguousarray(np.atleast_2d(np.asarray(compacts)))
        ts = np.broadcast_to(
            np.asarray(timestamps, np.float64).reshape(-1), (self.S,)
        )
        if self.n_nodes == 0:
            pose0 = (
                np.asarray(gt_poses, np.float32)
                if gt_poses is not None
                else np.broadcast_to(np.eye(4, dtype=np.float32),
                                     (self.S, 4, 4))
            )
            self.store, self.graph = self._first(
                self.store, self.graph, compacts, np.ascontiguousarray(pose0)
            )
            for i, sq in enumerate(self.seq):
                sq.timestamps.append(float(ts[i]))
                sq.n_nodes = 1
            self.n_nodes = 1
            self._frame_count = 1
            return

        new_id = self.n_nodes
        if new_id >= self.n_cap:
            raise RuntimeError("node capacity exceeded")
        edge_start = self.n_edges
        B = self.cand_batch
        if edge_start + B + 1 > self.e_cap:
            raise RuntimeError("edge capacity exceeded")
        pad = np.empty((self.S, B), np.int32)
        dup = np.empty((self.S, B), bool)
        dts = np.empty((self.S, B), np.float32)
        for i, sq in enumerate(self.seq):
            pad[i], dup[i], dts[i] = sq.frame_slots(new_id, float(ts[i]))
        seeds = np.asarray(
            (self._seed_base + self._frame_count) & 0xFFFFFFFF, np.uint32
        )
        out = self._compute(
            self.store, self.graph, compacts,
            np.int32(new_id), np.int32(new_id - 1),
            pad, dup, dts, seeds,
        )
        rows, new_pose, e_i, e_j, e_meas, e_info, e_active, summary, _ = out
        self.store, self.graph = self._commit(
            self.store, self.graph, rows, new_pose,
            np.int32(new_id), np.int32(edge_start),
            e_i, e_j, e_meas, e_info, e_active,
        )
        self.n_edges = edge_start + B + 1
        for sq in self.seq:
            sq.n_edges = self.n_edges
            sq.edge_pairs.extend([None] * (B + 1))
            sq.edge_types.extend([-1] * (B + 1))
        summary.copy_to_host_async()
        self._pending.append((new_id, pad, edge_start, summary))
        self.n_nodes += 1
        self._frame_count += 1
        for i, sq in enumerate(self.seq):
            sq.timestamps.append(float(ts[i]))
            sq.n_nodes = self.n_nodes
        if len(self._pending) >= self.params["tpu_drain_interval"]:
            self._drain(keep_newest=2)

    # ------------------------------------------------------------------
    def _drain(self, keep_newest: int = 0) -> None:
        """Batched summary pull + per-sequence bookkeeping — the
        GraphManager._drain_pending logic applied to each sequence."""
        if len(self._pending) <= keep_newest:
            return
        if keep_newest:
            pend = self._pending[:-keep_newest]
            self._pending = self._pending[-keep_newest:]
        else:
            pend = self._pending
            self._pending = []
        flats = jax.device_get([s for (_, _, _, s) in pend])
        B = self.cand_batch
        for (new_id, pad, edge_start, _), flat in zip(pend, flats):
            flat = np.asarray(flat)
            pred_id = new_id - 1
            for i, sq in enumerate(self.seq):
                s = StepSummary.unpack(flat[i], B)
                geodesic = GraphManager._geodesic_set(
                    sq, pred_id, self.params["geodesic_depth"]
                )
                accepted_ids = []
                for b in range(B):
                    cid = int(pad[i, b])
                    slot = edge_start + b
                    sq.edge_i_host[slot] = cid
                    sq.edge_j_host[slot] = new_id
                    sq.edge_pairs[slot] = (cid, new_id)
                    if bool(s.accepted[b]):
                        etype = (
                            EDGE_SEQUENTIAL
                            if (cid == pred_id or cid in geodesic)
                            else EDGE_LOOP
                        )
                        sq.edge_types[slot] = etype
                        sq.edge_active_host[slot] = True
                        sq.adjacency.setdefault(cid, set()).add(new_id)
                        sq.adjacency.setdefault(new_id, set()).add(cid)
                        accepted_ids.append(cid)
                        if etype == EDGE_LOOP:
                            sq.n_loop_edges += 1
                        else:
                            sq.n_seq_edges += 1
                fb = edge_start + B
                sq.edge_pairs[fb] = (pred_id, new_id)
                sq.edge_i_host[fb] = pred_id
                sq.edge_j_host[fb] = new_id
                if bool(s.fallback_used):
                    sq.edge_types[fb] = EDGE_CONST_POSITION
                    sq.edge_active_host[fb] = True
                    sq.adjacency.setdefault(pred_id, set()).add(new_id)
                    sq.adjacency.setdefault(new_id, set()).add(pred_id)
                if not any(c in sq.keyframes for c in accepted_ids):
                    if sq.keyframes[-1] != pred_id:
                        sq.keyframes.append(pred_id)

    # ------------------------------------------------------------------
    def optimize(self, iterations: Optional[int] = None,
                 blocking: bool = True, pcg_iters: int = 64) -> np.ndarray:
        """Batched full-graph LM over all S graphs (first-node fixation).
        Returns per-sequence chi² (NaN when non-blocking)."""
        self._drain(keep_newest=0 if blocking else 2)
        p = self.params
        solver = {"cholesky": "dense", "dense": "dense", "pcg": "pcg"}.get(
            p["backend_solver"], "dense" if self.n_cap <= 1024 else "pcg"
        )
        fixed = np.zeros((self.S, self.n_cap), bool)
        fixed[:, 0] = True
        self.graph = self.graph._replace(
            node_fixed=jax.device_put(
                fixed, self.graph.node_fixed.sharding
            )
        )
        key = (int(iterations or p["optimizer_iterations"]),
               int(pcg_iters), solver)
        cache = getattr(self, "_opt_cache", None)
        if cache is None or cache[0] != key:
            self._opt_cache = (key, self._opt_fn(*key))
        fn = self._opt_cache[1]
        self.graph, chi2, _ = fn(self.graph)
        if blocking:
            return np.asarray(chi2)
        return np.full(self.S, np.nan)

    # ------------------------------------------------------------------
    def prune_edges_above(self, threshold: float) -> np.ndarray:
        """Per-sequence pruneEdgesWithErrorAbove (graph_manager.cpp:1106):
        deactivate edges above chi², replace pruned consecutive-node edges
        with weak constant-position edges. Returns per-sequence counts."""
        self._drain()
        chi2 = np.asarray(self._chi2(self.graph))  # (S, E)
        const_info = float(self.params["constant_position_information"])
        new_edges: List[List[int]] = [[] for _ in range(self.S)]
        counts = np.zeros(self.S, np.int64)
        for i, sq in enumerate(self.seq):
            act = sq.edge_active_host
            for e in range(sq.n_edges):
                if not act[e] or chi2[i, e] <= threshold:
                    continue
                pair = sq.edge_pairs[e]
                act[e] = False
                counts[i] += 1
                if (
                    pair is not None
                    and abs(pair[0] - pair[1]) == 1
                    and sq.edge_types[e] != EDGE_CONST_POSITION
                ):
                    new_edges[i].append(min(pair))
        M = max((len(x) for x in new_edges), default=0)
        slots = np.full((self.S, max(M, 1)), self.e_cap - 1, np.int32)
        e_i = np.zeros((self.S, max(M, 1)), np.int32)
        e_j = np.zeros((self.S, max(M, 1)), np.int32)
        active = np.zeros((self.S, max(M, 1)), bool)
        for i, sq in enumerate(self.seq):
            for k, lo in enumerate(new_edges[i]):
                if sq.n_edges >= self.e_cap:
                    break
                slot = sq.n_edges
                sq.n_edges += 1
                sq.edge_pairs.append((lo, lo + 1))
                sq.edge_types.append(EDGE_CONST_POSITION)
                sq.edge_i_host[slot] = lo
                sq.edge_j_host[slot] = lo + 1
                sq.edge_active_host[slot] = True
                slots[i, k] = slot
                e_i[i, k] = lo
                e_j[i, k] = lo + 1
                active[i, k] = True
        # write the per-sequence active masks + appended edges in one pass
        act_S = np.stack([sq.edge_active_host for sq in self.seq])
        sh = self.graph.edge_active.sharding
        self.graph = self.graph._replace(
            edge_active=jax.device_put(act_S, sh)
        )
        info_scale = np.full((self.S, max(M, 1)), const_info, np.float32)
        if M > 0:
            self.graph = self._add_edges(
                self.graph, slots, e_i, e_j, info_scale, active
            )
        self.n_edges = max(sq.n_edges for sq in self.seq)
        return counts

    # ------------------------------------------------------------------
    def trajectories(self) -> np.ndarray:
        """(S, n_nodes, 4, 4) world_T_cam."""
        return np.asarray(self.graph.poses[:, : self.n_nodes])

    def statistics(self) -> List[dict]:
        self._drain()
        return [
            {
                "nodes": self.n_nodes,
                "edges": sq.n_edges,
                "active_edges": int(sq.edge_active_host.sum()),
                "loop_edges": sq.n_loop_edges,
                "sequential_edges": sq.n_seq_edges,
                "keyframes": len(sq.keyframes),
            }
            for sq in self.seq
        ]

    # ------------------------------------------------------------------
    def evaluation_protocol(self, gt_stamps=None, gt_xyz=None):
        """The reference's 5-level protocol, batched: L0 online poses; L1
        full optimize; L2..L4 prune chi² > {edge_error_threshold, 1, 0.25}
        + re-optimize (openni_listener.cpp:431-518). Returns
        {level: (S, T, 4, 4) poses} and, when GT is given, per-sequence ATE
        {level: (S,) rmse}. gt_stamps/gt_xyz: per-sequence lists."""
        from ..eval.ate import evaluate_ate

        p = self.params
        levels: Dict[int, np.ndarray] = {0: self.trajectories()}
        self.optimize(iterations=p["optimizer_iterations"] * 2)
        levels[1] = self.trajectories()
        thresholds = ((2, p["edge_error_threshold"]), (3, 1.0), (4, 0.25))
        for level, thresh in thresholds:
            self.prune_edges_above(thresh)
            self.optimize(iterations=p["optimizer_iterations"])
            levels[level] = self.trajectories()
        ate: Dict[int, np.ndarray] = {}
        if gt_stamps is not None and gt_xyz is not None:
            for level, poses in levels.items():
                rmse = np.full(self.S, np.nan)
                for i, sq in enumerate(self.seq):
                    try:
                        res = evaluate_ate(
                            sq.timestamps, poses[i, :, :3, 3],
                            gt_stamps[i], gt_xyz[i],
                        )
                        rmse[i] = res.rmse
                    except ValueError:
                        pass
                ate[level] = rmse
        return levels, ate
