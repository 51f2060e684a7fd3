"""Fully on-device SLAM step: extract + compare + decide + commit, one chain.

The reference pipelines node construction against graph insertion with
threads (openni_listener.cpp:788-814 callProcessing). The TPU analog goes
further: when every frame enters the graph (keep_all_nodes — the benchmark
protocol's setting, test/test_settings.launch), the per-candidate
accept/reject logic (RANSAC success, EMM criterion, motion sanity — the
nodeComparisons decisions, graph_manager.cpp:421-658) is pure elementwise
math, so the ENTIRE per-frame step runs as one jitted device program with
donated state and ZERO host round trips. Host bookkeeping (adjacency,
keyframes, edge types) drains from small summary buffers every few frames
in one batched pull.

Edge slots are pre-allocated per frame (B visual + 1 fallback), so slot
indices are deterministic on the host without knowing the decisions.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..optim.pose_graph import GraphState
from .compare import compare_to_candidates
from .node_store import NodeStore


class StepSummary(NamedTuple):
    """Per-frame outputs for host bookkeeping, unpacked from the flat
    (4B+2,) float32 vector slam_step returns (one array = one async
    device->host copy per frame; each copy call costs ~0.3 ms of host time
    on the tunnel, so the summary is packed rather than returned as six
    leaves)."""

    accepted: "object"  # (B,) bool — edge written for candidate b
    n_inliers: "object"  # (B,) int
    rmse: "object"  # (B,) float
    emm_quality: "object"  # (B,) float
    fallback_used: "object"  # () bool — constant-position edge written
    n_valid_kp: "object"  # () int

    @classmethod
    def unpack(cls, flat, B: int) -> "StepSummary":
        """flat: (4B+2,) numpy float32 (already on host)."""
        return cls(
            accepted=flat[:B] > 0.5,
            n_inliers=flat[B : 2 * B].astype(int),
            rmse=flat[2 * B : 3 * B],
            emm_quality=flat[3 * B : 4 * B],
            fallback_used=flat[4 * B] > 0.5,
            n_valid_kp=int(flat[4 * B + 1]),
        )


_STEP_STATICS = (
    "extractor",
    "cam",
    "cam_small",
    "stride",
    "ingest_fmt",
    "gray_bits",
    "depth_bits",
    "min_depth",
    "max_depth",
    "max_matches",
    "ratio",
    "n_hypotheses",
    "max_mahal_sq",
    "min_inliers",
    "emm_skip",
    "sigma_depth",
    "sample_size",
    "refine_iterations",
    "projective_iterations",
    "emm_exact",
    "edge_info_mode",
    "observability_threshold",
    "max_translation_per_s",
    "max_rotation_deg_per_s",
    "const_pos_information",
    "keep_all",
    "use_feature_min_depth",
    "wire_delta",
)


def _compute_body(
    store: NodeStore,
    graph: GraphState,
    packed,  # (N,) uint8 — ONE packed ingest buffer (manager.compact_frame)
    new_id,  # () int32
    pred_id,  # () int32
    cand_idx,  # (B,) int32
    cand_dup,  # (B,) bool — True for padding duplicates (masked out)
    cand_dt,  # (B,) float32 — |t_new - t_cand| per candidate
    seed,  # () uint32 — RNG derived in-program (host-side key ops cost ~3 ms)
    wire_prev=None,  # optional (gray q u8, depth q u16) — delta-wire state
    # --- static config ---
    extractor=None,
    cam: Intrinsics = None,
    cam_small: Intrinsics = None,
    stride: int = 2,
    ingest_fmt: str = "yc12",
    gray_bits: int = 8,
    depth_bits: int = 10,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
    max_matches: int = 300,
    ratio: float = 0.95,
    n_hypotheses: int = 200,
    max_mahal_sq: float = 9.0,
    min_inliers: int = 20,
    emm_skip: int = 2,
    sigma_depth: float = 0.01,
    sample_size: int = 4,
    refine_iterations: int = 6,
    projective_iterations: int = 0,
    emm_exact: bool = False,
    edge_info_mode: str = "scalar",
    observability_threshold: float = 0.0,
    max_translation_per_s: float = 1e10,
    max_rotation_deg_per_s: float = 1e10,
    const_pos_information: float = 1e-3,
    keep_all: bool = True,
    use_feature_min_depth: bool = False,
    wire_delta: bool = False,
):
    from .manager import _prepare_and_extract, _prepare_and_extract_wire

    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    if wire_delta:
        kp, depth_small, color_small, new_wire = _prepare_and_extract_wire(
            extractor, cam, stride, min_depth, max_depth,
            use_feature_min_depth, packed, wire_prev,
            gray_bits=gray_bits, depth_bits=depth_bits,
        )
    else:
        kp, depth_small, color_small = _prepare_and_extract(
            extractor, cam, stride, min_depth, max_depth,
            use_feature_min_depth, packed, fmt=ingest_fmt,
            gray_bits=gray_bits, depth_bits=depth_bits,
        )
        new_wire = None
    res = compare_to_candidates(
        kp,
        depth_small,
        store,
        cand_idx,
        key,
        cam_small,
        cam_fx=cam.fx,
        cam_fy=cam.fy,
        max_matches=max_matches,
        ratio=ratio,
        n_hypotheses=n_hypotheses,
        max_mahal_sq=max_mahal_sq,
        min_inliers=min_inliers,
        emm_skip=emm_skip,
        sigma_depth=sigma_depth,
        sample_size=sample_size,
        refine_iterations=refine_iterations,
        projective_iterations=projective_iterations,
        cam_cx=cam.cx,
        cam_cy=cam.cy,
        emm_exact=emm_exact,
        edge_info_mode=edge_info_mode,
    )

    # ---- on-device accept/reject (nodeComparisons decision logic) ---------
    B = cand_idx.shape[0]
    emm_ok = (
        jnp.asarray(observability_threshold <= 0.0)
        | ((res.emm_quality > observability_threshold) & (res.emm_inlier_frac > 0.25))
    )
    # motion sanity (per-second) — applied to the predecessor slot only
    T = res.transform
    trans = jnp.linalg.norm(T[:, :3, 3], axis=-1)
    tr = T[:, 0, 0] + T[:, 1, 1] + T[:, 2, 2]
    rot_deg = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))
    dt = jnp.maximum(cand_dt, 1e-3)
    sane = (trans / dt <= max_translation_per_s) & (
        rot_deg / dt <= max_rotation_deg_per_s
    )
    is_pred = cand_idx == pred_id
    accept = res.ransac_ok & emm_ok & ~cand_dup & (sane | ~is_pred)

    any_acc = jnp.any(accept)
    score = jnp.where(accept, res.n_inliers, -1)
    best = jnp.argmax(score)
    base_id = jnp.where(any_acc, cand_idx[best], pred_id)
    eye4 = jnp.eye(4, dtype=jnp.float32)
    base_T_new = jnp.where(any_acc, T[best], eye4)

    # ---- edge batch: B visual slots + 1 fallback slot ----------------------
    info_scale = res.n_inliers.astype(jnp.float32) / jnp.maximum(
        res.rmse * res.rmse, 1e-4
    )
    eye6 = jnp.eye(6, dtype=jnp.float32)
    if edge_info_mode == "hessian":
        # anisotropic GN pose information, trace-matched to the scalar
        # magnitude so the protocol's chi2 prune thresholds keep their
        # calibration (ops/registration.pose_information)
        tr = jnp.trace(res.info6, axis1=-2, axis2=-1) / 6.0
        vis_info = res.info6 * (
            info_scale / jnp.maximum(tr, 1e-12)
        )[:, None, None]
        # degenerate/rejected candidates fall back to the scalar identity
        ok_info = jnp.isfinite(vis_info).all(axis=(-2, -1)) & (tr > 0)
        vis_info = jnp.where(
            ok_info[:, None, None], vis_info,
            info_scale[:, None, None] * eye6,
        )
    else:
        vis_info = info_scale[:, None, None] * eye6
    fallback = (~any_acc) & jnp.asarray(keep_all)
    e_i = jnp.concatenate([cand_idx, pred_id[None]])
    e_j = jnp.full((B + 1,), new_id, jnp.int32)
    e_meas = jnp.concatenate([T, eye4[None]], axis=0)
    fb_info = const_pos_information / jnp.maximum(cand_dt[0], 1e-3)
    e_info = jnp.concatenate([vis_info, (fb_info * eye6)[None]], axis=0)
    e_active = jnp.concatenate([accept, fallback[None]])

    from ..ops.emm import emm_pool_maps

    new_pose = graph.poses[base_id] @ base_T_new
    rows = NodeRows(
        uv=kp.uv,
        xyz=kp.xyz,
        desc=kp.desc.astype(store.desc.dtype),
        kp_valid=kp.valid,
        depth=jnp.reshape(depth_small, (-1,)),
        emm_lohi=jnp.reshape(emm_pool_maps(depth_small), (-1,)),
        emm_zs=store.zs_row(depth_small),
        color=store.color_row(color_small),
    )
    summary = jnp.concatenate(
        [
            accept.astype(jnp.float32),
            res.n_inliers.astype(jnp.float32),
            res.rmse,
            res.emm_quality,
            fallback.astype(jnp.float32)[None],
            kp.count().astype(jnp.float32)[None],
        ]
    )
    return rows, new_pose, e_i, e_j, e_meas, e_info, e_active, summary, \
        new_wire


class NodeRows(NamedTuple):
    """One node's store row set, produced by the compute program and
    consumed by the commit program."""

    uv: "object"
    xyz: "object"
    desc: "object"
    kp_valid: "object"
    depth: "object"
    emm_lohi: "object"
    emm_zs: "object"
    color: "object"


def _commit_body(
    store: NodeStore,
    graph: GraphState,
    rows: NodeRows,
    new_pose,  # (4, 4)
    new_id,  # () int32
    edge_start,  # () int32
    e_i,  # (B+1,) int32
    e_j,
    e_meas,
    e_info,
    e_active,
):
    """Write one node + its edge batch into the donated state.

    Kept as a SEPARATE device program from the compute body: a program that
    both gathers from and scatters into the same donated buffer makes XLA's
    copy insertion materialize a defensive full-buffer copy (store.depth +
    store.emm_lohi alone are 2 x 314 MB ~ 2 ms/frame of HBM traffic; an
    in-program optimization_barrier did not elide them). This program only
    scatters, so donation aliases every buffer and the writes are O(row).
    """
    B1 = e_i.shape[0]
    sl = jnp.arange(B1) + edge_start
    store = store._replace(
        uv=store.uv.at[new_id].set(rows.uv),
        xyz=store.xyz.at[new_id].set(rows.xyz),
        desc=store.desc.at[new_id].set(rows.desc),
        kp_valid=store.kp_valid.at[new_id].set(rows.kp_valid),
        depth=store.depth.at[new_id].set(rows.depth),
        emm_lohi=store.emm_lohi.at[new_id].set(rows.emm_lohi),
        emm_zs=store.emm_zs.at[new_id].set(rows.emm_zs),
        color=store.color.at[new_id].set(rows.color),
    )
    graph = graph._replace(
        poses=graph.poses.at[new_id].set(new_pose),
        node_active=graph.node_active.at[new_id].set(True),
        edge_i=graph.edge_i.at[sl].set(jnp.where(e_active, e_i, graph.edge_i[sl])),
        edge_j=graph.edge_j.at[sl].set(jnp.where(e_active, e_j, graph.edge_j[sl])),
        edge_meas=graph.edge_meas.at[sl].set(
            jnp.where(e_active[:, None, None], e_meas, graph.edge_meas[sl])
        ),
        edge_info=graph.edge_info.at[sl].set(
            jnp.where(e_active[:, None, None], e_info, graph.edge_info[sl])
        ),
        edge_active=graph.edge_active.at[sl].set(e_active | graph.edge_active[sl]),
    )
    return store, graph


def _step_body(
    store: NodeStore,
    graph: GraphState,
    packed,
    new_id,
    pred_id,
    cand_idx,
    cand_dup,
    cand_dt,
    edge_start,
    seed,
    wire_prev=None,
    **cfg,
):
    """Fused single-program step (compute + commit) — used by slam_step2;
    the manager's per-frame fast path dispatches slam_compute + slam_commit
    instead (see _commit_body's docstring for why)."""
    (rows, new_pose, e_i, e_j, e_meas, e_info, e_active, summary,
     new_wire) = _compute_body(
        store, graph, packed, new_id, pred_id, cand_idx, cand_dup, cand_dt,
        seed, wire_prev, **cfg,
    )
    store, graph = _commit_body(
        store, graph, rows, new_pose, new_id, edge_start,
        e_i, e_j, e_meas, e_info, e_active,
    )
    return store, graph, summary, new_wire


slam_step = functools.partial(
    jax.jit, static_argnames=_STEP_STATICS, donate_argnums=(0, 1)
)(_step_body)

# Split-program fast path: compute READS the state (no donation — outputs
# are small row/edge arrays), commit SCATTERS into donated state (aliases
# in-place, no defensive copies). Queued back to back they execute in order
# on the device; the host never syncs between them.
slam_compute = functools.partial(jax.jit, static_argnames=_STEP_STATICS)(
    _compute_body
)
slam_commit = jax.jit(_commit_body, donate_argnums=(0, 1))


@functools.partial(
    jax.jit, static_argnames=_STEP_STATICS, donate_argnums=(0, 1)
)
def slam_step2(
    store: NodeStore,
    graph: GraphState,
    packed2,  # (2, N) uint8 — two packed ingest buffers ((b0, b1) tuple in
    #          delta-wire mode, where I and P buffers differ in length)
    new_ids,  # (2,) int32
    pred_ids,  # (2,) int32
    cand_idx2,  # (2, B) int32
    cand_dup2,  # (2, B) bool
    cand_dt2,  # (2, B) float32
    edge_starts,  # (2,) int32
    seeds,  # (2,) uint32
    wire_prev=None,
    **cfg,
):
    """TWO consecutive frames in ONE device program: frame 1's comparison
    reads frame 0's freshly committed store row inside the same dispatch
    (and, in delta-wire mode, frame 1's decode predicts from frame 0's
    freshly reconstructed wire codes). Halves the per-frame fixed
    dispatch/transfer round-trips on links where they dominate
    (tpu_frames_per_step=2). Results are identical to two sequential
    slam_step calls (same body, same order; asserted in
    tests/test_round2_features.py)."""
    s0_store, s0_graph, sum0, wire0 = _step_body(
        store, graph, packed2[0], new_ids[0], pred_ids[0], cand_idx2[0],
        cand_dup2[0], cand_dt2[0], edge_starts[0], seeds[0], wire_prev, **cfg,
    )
    s1_store, s1_graph, sum1, wire1 = _step_body(
        s0_store, s0_graph, packed2[1], new_ids[1], pred_ids[1], cand_idx2[1],
        cand_dup2[1], cand_dt2[1], edge_starts[1], seeds[1], wire0, **cfg,
    )
    return s1_store, s1_graph, sum0, sum1, wire1


@functools.lru_cache(maxsize=None)
def make_slam_stepN(n: int):
    """N consecutive frames in ONE device program (tpu_frames_per_step=N).

    The round-5 wire measurements (WIRE.md + the interleaved Wilcoxon A/Bs
    in PARITY.md) showed the per-frame bound is NOT transfer bytes (puts
    stream pipelined and mostly hide behind compute) but the fixed
    per-dispatch client/host cost (~step_resident - device_busy). Fusing N
    steps into one program divides that fixed cost by N while keeping
    results identical to N sequential slam_step calls: the same _step_body
    chain, each frame's comparison reading its predecessor's freshly
    committed store row inside the dispatch (equality asserted in
    tests/test_round2_features.py).

    The program is traced once per N (lru_cache) and keyed like slam_step;
    packedN accepts a stacked (N, L) array or an N-tuple (delta-wire I/P
    mixes, where buffer lengths differ).
    """

    @functools.partial(
        jax.jit, static_argnames=_STEP_STATICS, donate_argnums=(0, 1)
    )
    def slam_stepN(
        store, graph, packedN, new_ids, pred_ids, cand_idxN, cand_dupN,
        cand_dtN, edge_starts, seeds, wire_prev=None, **cfg,
    ):
        sums = []
        wire = wire_prev
        for k in range(n):
            store, graph, s, wire = _step_body(
                store, graph, packedN[k], new_ids[k], pred_ids[k],
                cand_idxN[k], cand_dupN[k], cand_dtN[k], edge_starts[k],
                seeds[k], wire, **cfg,
            )
            sums.append(s)
        return store, graph, tuple(sums), wire

    return slam_stepN
