import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.optim import GraphState, edge_chi2, make_graph_state, optimize


def _diag_info(scale=100.0, n=1):
    return jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32) * scale, (n, 6, 6))


def _build_loop_graph(n_nodes=20, drift=0.02, seed=0, loop=True):
    """Circle trajectory with noisy odometry edges + one exact loop closure."""
    rng = np.random.default_rng(seed)
    # Ground-truth poses around a circle
    gt = []
    for k in range(n_nodes):
        ang = 2 * np.pi * k / n_nodes
        xi = np.array([np.cos(ang), np.sin(ang), 0.0, 0, 0, ang], np.float32)
        gt.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    gt = np.stack(gt)

    # Odometry measurements: true relative + noise
    meas, ei, ej = [], [], []
    for k in range(n_nodes - 1):
        Z = np.asarray(se3.relative(jnp.asarray(gt[k]), jnp.asarray(gt[k + 1])))
        noise = se3.exp_se3(jnp.asarray(rng.normal(0, drift, 6).astype(np.float32)))
        meas.append(np.asarray(jnp.asarray(Z) @ noise))
        ei.append(k)
        ej.append(k + 1)
    if loop:
        Z = np.asarray(se3.relative(jnp.asarray(gt[-1]), jnp.asarray(gt[0])))
        meas.append(Z)
        ei.append(n_nodes - 1)
        ej.append(0)

    # Initialize poses by chaining noisy odometry (accumulates drift)
    init = [gt[0]]
    for k in range(n_nodes - 1):
        init.append(init[-1] @ meas[k])
    init = np.stack(init)

    n_cap, e_cap = 32, 64
    g = make_graph_state(n_cap, e_cap)
    E = len(meas)
    g = g._replace(
        poses=g.poses.at[:n_nodes].set(jnp.asarray(init)),
        node_active=g.node_active.at[:n_nodes].set(True),
        node_fixed=g.node_fixed.at[0].set(True),
        edge_i=g.edge_i.at[:E].set(jnp.asarray(ei, jnp.int32)),
        edge_j=g.edge_j.at[:E].set(jnp.asarray(ej, jnp.int32)),
        edge_meas=g.edge_meas.at[:E].set(jnp.asarray(np.stack(meas))),
        edge_info=g.edge_info.at[:E].set(_diag_info(100.0, E)),
        edge_active=g.edge_active.at[:E].set(True),
    )
    return g, gt, init


def test_chain_without_noise_zero_chi2():
    g, gt, init = _build_loop_graph(n_nodes=8, drift=0.0, loop=False)
    chi2 = float(jnp.sum(edge_chi2(g)))
    assert chi2 < 1e-6


def test_optimize_reduces_chi2_and_closes_loop():
    g, gt, init = _build_loop_graph(n_nodes=20, drift=0.02)
    chi2_before = float(jnp.sum(edge_chi2(g)))
    g2, chi2_after, it = optimize(g, iterations=30)
    assert float(chi2_after) < chi2_before * 0.1
    # End pose should be much closer to gt after optimization
    err_before = np.linalg.norm(init[-1][:3, 3] - gt[-1][:3, 3])
    err_after = float(
        jnp.linalg.norm(g2.poses[19][:3, 3] - jnp.asarray(gt[-1][:3, 3]))
    )
    assert err_after < err_before * 0.6
    # Fixed node unchanged
    np.testing.assert_allclose(
        np.asarray(g2.poses[0]), np.asarray(g.poses[0]), atol=1e-6
    )


def test_optimize_inactive_edges_ignored():
    g, gt, init = _build_loop_graph(n_nodes=10, drift=0.01)
    # deactivate the loop edge: plain chain should reach ~zero chi2
    E = 10  # 9 odometry + 1 loop
    g = g._replace(edge_active=g.edge_active.at[E - 1].set(False))
    g2, chi2_after, _ = optimize(g, iterations=25)
    assert float(chi2_after) < 1e-3


def test_huber_downweights_bad_loop_edge():
    g, gt, init = _build_loop_graph(n_nodes=12, drift=0.005)
    # corrupt the loop-closure measurement grossly
    E = 12
    bad = np.asarray(
        se3.exp_se3(jnp.asarray([1.0, -1.0, 0.5, 0.5, -0.3, 0.9], jnp.float32))
    )
    g = g._replace(edge_meas=g.edge_meas.at[E - 1].set(jnp.asarray(bad)))
    g2, chi2, _ = optimize(g, iterations=25, huber_delta=1.0)
    # good odometry edges should remain near-satisfied (bad edge absorbed)
    per_edge = np.asarray(edge_chi2(g2))
    assert np.median(per_edge[: E - 1]) < 1.0
    # the bad edge is identifiable by large chi2 -> prunable
    assert per_edge[E - 1] > 10 * np.median(per_edge[: E - 1] + 1e-9)


def test_edge_chi2_for_pruning_protocol():
    g, _, _ = _build_loop_graph(n_nodes=10, drift=0.05)
    c = np.asarray(edge_chi2(g))
    assert (c[:10] >= 0).all()
    assert c[10:].sum() == 0  # inactive slots contribute nothing
