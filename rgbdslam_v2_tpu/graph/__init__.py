from .node_store import NodeStore  # noqa: F401
from .manager import GraphManager, MatchDecision  # noqa: F401
