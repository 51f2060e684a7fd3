"""GraphManager: host orchestration of the SLAM pose graph.

Capability parity with the reference's GraphManager
(reference: src/graph_manager.{h,cpp}):
  addNode              graph_manager.cpp:681  (first-node handling :360-402)
  nodeComparisons      :421-658 (predecessor match, motion gates, candidate
                        fan-out, edge insertion, fallback edges, keyframes)
  candidate selection  getPotentialEdgeTargetsWithDijkstra :204-324
                        (sequential predecessors + geodesic neighbors +
                         random keyframe sampling)
  optimizeGraph        :900-1066 (skip-step, chi² convergence — optim/)
  pruneEdgesWithError  :1106-1246 (chi²-based pruning; consecutive edges
                        fall back to constant-position)
  motion gates         isBigTrafo/isSmallTrafo misc.cpp:272-344

Division of labor (TPU-first): all per-frame compute — feature extraction,
B-candidate matching/RANSAC/EMM, graph optimization — runs in jitted device
kernels; this class only does O(nodes) bookkeeping: ids, adjacency BFS,
keyframe lists, and accept/reject decisions on scalar results.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ParameterServer, default_params
from ..core import se3
from ..core.camera import Intrinsics
from ..core.frames import Frame
from ..models.orb import OrbExtractor, min_depth_map
from ..models.types import Keypoints
from ..optim.pose_graph import GraphState, edge_chi2, make_graph_state, optimize
from .compare import CompareResult, compare_to_candidates
from .node_store import NodeStore

EDGE_SEQUENTIAL = 0
EDGE_LOOP = 1
EDGE_ODOMETRY = 2
EDGE_CONST_POSITION = 3


@dataclasses.dataclass
class MatchDecision:
    """Host-side record of one accepted/rejected candidate comparison."""

    cand_id: int
    accepted: bool
    reason: str
    n_inliers: int = 0
    rmse: float = 0.0
    emm_quality: float = 1.0


class GraphManager:
    def __init__(
        self,
        cam: Intrinsics,
        params: Optional[ParameterServer] = None,
        extractor: Optional[OrbExtractor] = None,
    ):
        self.params = params or default_params()
        p = self.params
        self.cam = cam
        self.n_cap = p["tpu_max_nodes"]
        self.e_cap = p["tpu_max_edges"]
        self.k_cap = p["max_keypoints"]
        self.cand_batch = p["tpu_candidate_batch"]
        self.emm_stride = p["cloud_creation_skip_step"]
        s = self.emm_stride
        self.cam_small = Intrinsics(
            fx=cam.fx / s,
            fy=cam.fy / s,
            cx=cam.cx / s,
            cy=cam.cy / s,
            width=cam.width // s,
            height=cam.height // s,
        )
        self.extractor = extractor or OrbExtractor(
            max_keypoints=self.k_cap,
            fast_threshold=0.06,
            grid=p["detector_grid_resolution"] + 1,
        )
        self.store = NodeStore.create(
            self.n_cap,
            self.k_cap,
            256,
            self.cam_small.height,
            self.cam_small.width,
        )
        self.graph = make_graph_state(self.n_cap, self.e_cap)
        self.n_nodes = 0
        self.n_edges = 0
        self.n_loop_edges = 0
        self.n_seq_edges = 0
        self.timestamps: List[float] = []
        self.keyframes: List[int] = [0]
        self.adjacency: Dict[int, Set[int]] = {}
        self.edge_types: List[int] = []
        self.edge_pairs: List[tuple] = []
        self._key = jax.random.PRNGKey(p["tpu_seed"])
        self._rng = np.random.default_rng(p["tpu_seed"])
        self.last_decisions: List[MatchDecision] = []
        self.nodes_since_optimize = 0
        self.mapping_enabled = True  # toggleMapping capability (localization-only)
        self.odometry = None  # OdometryProvider (use_robot_odom)
        self._jit_extract = jax.jit(
            lambda g, d: self.extractor(g, d, self.cam)
        )

    # ------------------------------------------------------------------
    def set_odometry_provider(self, provider):
        """Attach an OdometryProvider (graph_mgr_odom capability)."""
        self.odometry = provider

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def extract(self, frame: Frame) -> Keypoints:
        return self._jit_extract(frame.gray, min_depth_map(frame.depth, frame.valid))

    # ------------------------------------------------------------------
    def select_candidates(self, new_id: int, kp: Optional[Keypoints] = None) -> List[int]:
        """Sequential predecessors + geodesic BFS neighbors + random keyframes
        (+ optional appearance-based global retrieval, loop_closing.cpp
        capability, when global_loop_candidates > 0)."""
        p = self.params
        B = self.cand_batch
        preds = list(range(new_id - 1, max(-1, new_id - 1 - p["predecessor_candidates"]), -1))
        out = list(preds)

        # geodesic neighborhood: BFS from the predecessor over graph edges,
        # excluding direct predecessors; sample with 1/depth weighting
        if new_id >= 1 and len(out) < B:
            start = new_id - 1
            depth_of = {start: 0}
            frontier = [start]
            for d in range(1, p["geodesic_depth"] + 1):
                nxt = []
                for u in frontier:
                    for v in self.adjacency.get(u, ()):  # neighbors
                        if v not in depth_of:
                            depth_of[v] = d
                            nxt.append(v)
                frontier = nxt
            cand = [v for v in depth_of if v not in out and v != new_id and depth_of[v] > 0]
            if cand:
                w = np.asarray([1.0 / depth_of[v] for v in cand])
                w = w / w.sum()
                n_geo = min(p["neighbor_candidates"], len(cand), B - len(out))
                if n_geo > 0:
                    sel = self._rng.choice(len(cand), size=n_geo, replace=False, p=w)
                    out.extend(cand[i] for i in sel)

        # appearance-based global retrieval (exact, one MXU matmul)
        n_global = p["global_loop_candidates"]
        if n_global > 0 and kp is not None and len(out) < B and new_id > 4:
            from .loop_closing import retrieve_loop_candidates

            hits = retrieve_loop_candidates(
                kp,
                self.store,
                self.n_nodes,
                exclude_ids=out + [new_id],
                top_n=min(n_global, B - len(out)),
            )
            out.extend(h for h in hits if h not in out)

        # random keyframe sampling (loop-closure discovery)
        kf_pool = [k for k in self.keyframes if k not in out and k != new_id]
        n_rand = min(len(kf_pool), B - len(out), max(p["min_sampled_candidates"], 0))
        if n_rand > 0:
            sel = self._rng.choice(len(kf_pool), size=n_rand, replace=False)
            out.extend(kf_pool[i] for i in sel)
        return out[:B]

    # ------------------------------------------------------------------
    def _motion_small(self, T: np.ndarray, dt: float) -> bool:
        """isSmallTrafo: motion below per-second minimum -> redundant frame."""
        p = self.params
        dt = max(dt, 1e-3)
        trans = float(se3.translation_norm(jnp.asarray(T))) / dt
        rot = float(se3.rotation_angle(jnp.asarray(T))) * 180.0 / np.pi / dt
        return trans < p["min_translation_meter"] and rot < p["min_rotation_degree"]

    def _motion_sane(self, T: np.ndarray, dt: float) -> bool:
        """isBigTrafo inverse: reject impossibly fast motion."""
        p = self.params
        dt = max(dt, 1e-3)
        trans = float(se3.translation_norm(jnp.asarray(T))) / dt
        rot = float(se3.rotation_angle(jnp.asarray(T))) * 180.0 / np.pi / dt
        return trans <= p["max_translation_meter"] and rot <= p["max_rotation_degree"]

    # ------------------------------------------------------------------
    def _add_edge(self, i: int, j: int, meas: np.ndarray, info_scale: float, etype: int):
        self._add_edge_full(
            i, j, meas, np.eye(6, dtype=np.float32) * info_scale, etype
        )

    def _add_edge_full(self, i: int, j: int, meas: np.ndarray, info: np.ndarray, etype: int):
        e = self.n_edges
        if e >= self.e_cap:
            raise RuntimeError("edge capacity exceeded")
        info = jnp.asarray(info, jnp.float32)
        self.graph = self.graph._replace(
            edge_i=self.graph.edge_i.at[e].set(i),
            edge_j=self.graph.edge_j.at[e].set(j),
            edge_meas=self.graph.edge_meas.at[e].set(jnp.asarray(meas)),
            edge_info=self.graph.edge_info.at[e].set(info),
            edge_active=self.graph.edge_active.at[e].set(True),
        )
        self.n_edges += 1
        self.adjacency.setdefault(i, set()).add(j)
        self.adjacency.setdefault(j, set()).add(i)
        self.edge_types.append(etype)
        self.edge_pairs.append((i, j))
        if etype == EDGE_LOOP:
            self.n_loop_edges += 1
        elif etype == EDGE_SEQUENTIAL:
            self.n_seq_edges += 1

    def _activate_node(self, idx: int, pose: jnp.ndarray, fixed: bool = False):
        self.graph = self.graph._replace(
            poses=self.graph.poses.at[idx].set(pose),
            node_active=self.graph.node_active.at[idx].set(True),
            node_fixed=self.graph.node_fixed.at[idx].set(fixed),
        )

    # ------------------------------------------------------------------
    def add_node(
        self,
        frame: Frame,
        timestamp: float,
        ground_truth_pose: Optional[np.ndarray] = None,
    ) -> bool:
        """Process one frame; returns True if the node entered the graph."""
        p = self.params
        kp = self.extract(frame)
        depth_small = frame.depth[:: self.emm_stride, :: self.emm_stride]
        color_small = frame.rgb[:: self.emm_stride, :: self.emm_stride]

        if self.n_nodes == 0:
            # firstNode (graph_manager.cpp:360-402): fixed at GT or identity.
            pose = (
                jnp.asarray(ground_truth_pose, jnp.float32)
                if ground_truth_pose is not None
                else jnp.eye(4, dtype=jnp.float32)
            )
            self.store = self.store.insert(0, kp, depth_small, color_small)
            self._activate_node(0, pose, fixed=True)
            self.n_nodes = 1
            self.timestamps.append(timestamp)
            self.keyframes = [0]
            self.last_decisions = []
            return True

        new_id = self.n_nodes
        if new_id >= self.n_cap:
            raise RuntimeError("node capacity exceeded")
        pred_id0 = new_id - 1
        dt0 = max(timestamp - self.timestamps[pred_id0], 1e-3)

        # ---- odometry-only mode (use_robot_odom_only, graph_mgr_odom) -----
        if p["use_robot_odom_only"]:
            if self.odometry is None:
                raise RuntimeError("use_robot_odom_only without an odometry provider")
            delta = self.odometry.delta(self.timestamps[pred_id0], timestamp)
            if delta is None:
                return False
            prev_pose = self.graph.poses[pred_id0]
            self.store = self.store.insert(new_id, kp, depth_small, color_small)
            self._activate_node(new_id, prev_pose @ jnp.asarray(delta))
            from .odometry import odometry_information

            info = odometry_information(dt0, p["odometry_information_factor"])
            self._add_edge_full(pred_id0, new_id, delta, info, EDGE_ODOMETRY)
            self.n_nodes += 1
            self.timestamps.append(timestamp)
            return True

        cand_ids = self.select_candidates(new_id, kp)
        B = self.cand_batch
        padded = (cand_ids + [cand_ids[0]] * B)[:B]
        cand_idx = jnp.asarray(padded, jnp.int32)

        res: CompareResult = compare_to_candidates(
            kp,
            depth_small,
            self.store,
            cand_idx,
            self._next_key(),
            self.cam_small,
            cam_fx=self.cam.fx,
            cam_fy=self.cam.fy,
            max_matches=p["max_matches"],
            ratio=p["nn_distance_ratio"],
            n_hypotheses=p["ransac_iterations"],
            max_mahal_sq=p["max_dist_for_inliers"] ** 2,
            min_inliers=p["min_matches"],
            emm_skip=p["emm_skip_step"],
            sigma_depth=p["sigma_depth"],
        )
        # Pull scalars to host once.
        T_all = np.asarray(res.transform)
        n_inl = np.asarray(res.n_inliers)
        rmse = np.asarray(res.rmse)
        ok = np.asarray(res.ransac_ok)
        emm_q = np.asarray(res.emm_quality)
        emm_f = np.asarray(res.emm_inlier_frac)

        pred_id = new_id - 1
        dt_pred = max(timestamp - self.timestamps[pred_id], 1e-3)
        decisions: List[MatchDecision] = []
        accepted: List[int] = []  # positions into cand list
        seen: Set[int] = set()
        emm_thresh = p["observability_threshold"]
        for b, cid in enumerate(padded):
            if cid in seen:
                continue
            seen.add(cid)
            d = MatchDecision(
                cand_id=cid,
                accepted=False,
                reason="",
                n_inliers=int(n_inl[b]),
                rmse=float(rmse[b]),
                emm_quality=float(emm_q[b]),
            )
            if not ok[b]:
                d.reason = "ransac_failed"
            elif emm_thresh > 0 and not (
                emm_q[b] > emm_thresh and emm_f[b] > 0.25
            ):
                d.reason = "emm_rejected"
            else:
                dt = max(abs(timestamp - self.timestamps[cid]), 1e-3)
                # sanity gate applies to sequential motion only (reference
                # checks predecessor motion; loop closures may be large)
                if cid == pred_id and not self._motion_sane(T_all[b], dt):
                    d.reason = "motion_insane"
                else:
                    d.accepted = True
                    d.reason = "ok"
                    accepted.append(b)
            decisions.append(d)
        self.last_decisions = decisions

        # Redundancy filter: motion to predecessor too small -> drop frame
        # (isSmallTrafo semantics; keep if it's been long since last node).
        pred_pos = next(
            (i for i, b in enumerate(accepted) if padded[b] == pred_id), None
        )
        if (
            pred_pos is not None
            and len(accepted) > 0
            and self._motion_small(T_all[accepted[pred_pos]], dt_pred)
        ):
            return False

        took_node = False
        if accepted and self.mapping_enabled:
            # Initial pose from the best (most inliers) accepted edge.
            best_b = max(accepted, key=lambda b: n_inl[b])
            base_pose = self.graph.poses[padded[best_b]]
            new_pose = base_pose @ jnp.asarray(T_all[best_b])
            self.store = self.store.insert(new_id, kp, depth_small, color_small)
            self._activate_node(new_id, new_pose)
            geodesic = self._geodesic_set(pred_id, p["geodesic_depth"])
            for b in accepted:
                cid = padded[b]
                info_scale = float(n_inl[b]) / max(float(rmse[b]) ** 2, 1e-4)
                etype = (
                    EDGE_SEQUENTIAL
                    if (cid == pred_id or cid in geodesic)
                    else EDGE_LOOP
                )
                self._add_edge(cid, new_id, T_all[b], info_scale, etype)
            took_node = True
        elif p["keep_all_nodes"] or (
            p["keep_good_nodes"] and int(kp.count()) > p["min_keypoints"]
        ):
            # Fallback constant-position edge (graph_manager.cpp:636-655).
            prev_pose = self.graph.poses[pred_id]
            self.store = self.store.insert(new_id, kp, depth_small, color_small)
            self._activate_node(new_id, prev_pose)
            info_scale = p["constant_position_information"] / dt_pred
            self._add_edge(pred_id, new_id, np.eye(4, dtype=np.float32), info_scale, EDGE_CONST_POSITION)
            took_node = True

        if not took_node:
            return False

        # Robot odometry edge alongside visual edges (graph_mgr_odom.cpp:62).
        if p["use_robot_odom"] and self.odometry is not None:
            delta = self.odometry.delta(self.timestamps[pred_id], timestamp)
            if delta is not None:
                from .odometry import odometry_information

                info = odometry_information(dt_pred, p["odometry_information_factor"])
                self._add_edge_full(pred_id, new_id, delta, info, EDGE_ODOMETRY)

        self.n_nodes += 1
        self.timestamps.append(timestamp)

        # Keyframe bookkeeping (addKeyframe :784-809): if no accepted edge
        # reaches the latest keyframe, the predecessor becomes a keyframe.
        if not any(padded[b] in self.keyframes for b in accepted):
            if self.keyframes[-1] != pred_id:
                self.keyframes.append(pred_id)

        self.nodes_since_optimize += 1
        if self.nodes_since_optimize >= p["optimizer_skip_step"]:
            self.optimize()
        return True

    # ------------------------------------------------------------------
    def _geodesic_set(self, start: int, depth: int) -> Set[int]:
        seen = {start}
        frontier = [start]
        for _ in range(depth):
            nxt = []
            for u in frontier:
                for v in self.adjacency.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
        return seen

    # ------------------------------------------------------------------
    def _apply_fixation(self):
        """pose_relative_to strategies (graph_manager.cpp:911-937)."""
        strategy = self.params["pose_relative_to"]
        fixed = jnp.zeros(self.n_cap, bool)
        if strategy == "previous" and self.n_nodes > 1:
            fixed = fixed.at[self.n_nodes - 2].set(True)
        elif strategy == "largest_loop" and self.n_loop_edges > 0:
            # fix everything before the earliest node touched by a loop edge
            loop_nodes = [
                min(i, j)
                for (i, j), t in zip(self.edge_pairs, self.edge_types)
                if t == EDGE_LOOP
            ]
            cutoff = min(loop_nodes) if loop_nodes else 0
            mask = np.zeros(self.n_cap, bool)
            mask[: cutoff + 1] = True
            fixed = jnp.asarray(mask)
        else:  # "first" (default) and "inaffected" fallback
            fixed = fixed.at[0].set(True)
        if not bool(jnp.any(fixed & self.graph.node_active)):
            fixed = fixed.at[0].set(True)
        self.graph = self.graph._replace(node_fixed=fixed)

    def optimize(self, iterations: Optional[int] = None) -> float:
        p = self.params
        self._apply_fixation()
        self.graph, chi2, _ = optimize(
            self.graph,
            iterations=iterations or p["optimizer_iterations"],
            huber_delta=p["huber_delta"],
        )
        self.nodes_since_optimize = 0
        return float(chi2)

    # ------------------------------------------------------------------
    def prune_edges_above(self, threshold: float) -> int:
        """pruneEdgesWithErrorAbove (graph_manager.cpp:1106-1246).

        Deactivates non-sequential edges with chi² above threshold; pruned
        consecutive-node edges are replaced by constant-position edges.
        """
        chi2 = np.asarray(edge_chi2(self.graph))
        active = np.asarray(self.graph.edge_active)
        n_pruned = 0
        new_active = active.copy()
        for e in range(self.n_edges):
            if not active[e] or chi2[e] <= threshold:
                continue
            i, j = self.edge_pairs[e]
            if abs(i - j) == 1 and self.edge_types[e] != EDGE_CONST_POSITION:
                # keep graph connected: replace with weak identity edge
                new_active[e] = False
                self._add_edge(
                    min(i, j),
                    max(i, j),
                    np.eye(4, dtype=np.float32),
                    self.params["constant_position_information"],
                    EDGE_CONST_POSITION,
                )
            else:
                new_active[e] = False
            n_pruned += 1
        self.graph = self.graph._replace(edge_active=jnp.asarray(new_active))
        return n_pruned

    # ------------------------------------------------------------------
    def poses(self) -> np.ndarray:
        return np.asarray(self.graph.poses[: self.n_nodes])

    def trajectory(self):
        return list(self.timestamps), self.poses()

    def reset(self):
        self.__init__(self.cam, self.params, self.extractor)

    def toggle_mapping(self, enabled: bool):
        """Localization-only mode (graph_manager2.cpp:25-35)."""
        self.mapping_enabled = enabled
        if not enabled:
            mask = np.zeros(self.n_cap, bool)
            mask[: self.n_nodes] = True
            self.graph = self.graph._replace(node_fixed=jnp.asarray(mask))

    def statistics(self) -> dict:
        return {
            "nodes": self.n_nodes,
            "edges": self.n_edges,
            "active_edges": int(np.asarray(self.graph.edge_active).sum()),
            "loop_edges": self.n_loop_edges,
            "sequential_edges": self.n_seq_edges,
            "keyframes": len(self.keyframes),
        }

    # ------------------------------------------------------------------
    def delete_last_frame(self):
        """deleteLastFrame capability (graph_manager2.cpp:61): remove the
        newest node and its edges from the active graph."""
        if self.n_nodes <= 1:
            return
        nid = self.n_nodes - 1
        active = np.array(self.graph.edge_active)
        for e, (i, j) in enumerate(self.edge_pairs):
            if i == nid or j == nid:
                active[e] = False
                self.adjacency.get(i, set()).discard(j)
                self.adjacency.get(j, set()).discard(i)
        self.graph = self.graph._replace(
            edge_active=jnp.asarray(active),
            node_active=self.graph.node_active.at[nid].set(False),
        )
        self.store = self.store.clear_features(nid)
        self.n_nodes -= 1
        self.timestamps.pop()
        if self.keyframes and self.keyframes[-1] == nid:
            self.keyframes.pop()

    def clear_feature_information(self, node_id: int):
        """clearFeatureInformation capability (node.cpp:1431): free the
        feature slots of non-keyframes (clear_non_keyframes param)."""
        self.store = self.store.clear_features(node_id)

    def sanity_check(self) -> List[str]:
        """sanityCheck capability (graph_manager.cpp:1347)."""
        problems = []
        poses = self.poses()
        if not np.isfinite(poses).all():
            problems.append("non-finite pose entries")
        R = poses[:, :3, :3]
        orth = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        if orth > 1e-2:
            problems.append(f"non-orthonormal rotations (max dev {orth:.2e})")
        active = np.asarray(self.graph.edge_active)
        for e in range(self.n_edges):
            if active[e]:
                i, j = self.edge_pairs[e]
                if i >= self.n_nodes or j >= self.n_nodes:
                    problems.append(f"edge {e} references inactive node")
        return problems

    def set_empirical_covariances(self, bandwidth: float = 0.1):
        """setEmpiricalCovariances capability (graph_manager2.cpp:111-144):
        re-derive edge information matrices from residual statistics."""
        from ..optim.covariance import empirical_information

        new_info = empirical_information(self.graph, bandwidth=bandwidth)
        self.graph = self.graph._replace(edge_info=new_info)

    def memory_footprint(self) -> dict:
        """getMemoryFootprint capability (node.cpp:1461): bytes per store."""
        def nbytes(tree):
            import jax

            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

        return {
            "node_store_bytes": nbytes(self.store),
            "graph_bytes": nbytes(self.graph),
            "nodes": self.n_nodes,
        }

    # ------------------------------------------------------------------
    def save_state(self, path):
        """Checkpoint the full SLAM state (capability beyond the reference,
        which has no mid-run checkpointing — SURVEY.md §5)."""
        import jax

        arrays = {
            f"store_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.store))
        }
        arrays.update(
            {f"graph_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.graph))}
        )
        meta = dict(
            n_nodes=self.n_nodes,
            n_edges=self.n_edges,
            n_loop_edges=self.n_loop_edges,
            n_seq_edges=self.n_seq_edges,
            timestamps=list(self.timestamps),
            keyframes=list(self.keyframes),
            edge_types=list(self.edge_types),
            edge_pairs=[list(p) for p in self.edge_pairs],
            adjacency={str(k): sorted(v) for k, v in self.adjacency.items()},
        )
        import json

        np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)

    def load_state(self, path):
        import jax
        import json

        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        store_leaves = [jnp.asarray(data[f"store_{i}"]) for i in range(len(jax.tree.leaves(self.store)))]
        graph_leaves = [jnp.asarray(data[f"graph_{i}"]) for i in range(len(jax.tree.leaves(self.graph)))]
        self.store = jax.tree.unflatten(jax.tree.structure(self.store), store_leaves)
        self.graph = jax.tree.unflatten(jax.tree.structure(self.graph), graph_leaves)
        self.n_nodes = meta["n_nodes"]
        self.n_edges = meta["n_edges"]
        self.n_loop_edges = meta["n_loop_edges"]
        self.n_seq_edges = meta["n_seq_edges"]
        self.timestamps = list(meta["timestamps"])
        self.keyframes = list(meta["keyframes"])
        self.edge_types = list(meta["edge_types"])
        self.edge_pairs = [tuple(p) for p in meta["edge_pairs"]]
        self.adjacency = {int(k): set(v) for k, v in meta["adjacency"].items()}
