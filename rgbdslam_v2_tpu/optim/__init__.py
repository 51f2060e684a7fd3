from .pose_graph import GraphState, optimize, edge_chi2, make_graph_state  # noqa: F401
