from .timing import ScopedTimer, timing_stats, reset_timing_stats  # noqa: F401
from .logsetup import get_logger, configure_logging  # noqa: F401
