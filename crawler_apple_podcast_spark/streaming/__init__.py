from .frontier_stream import (  # noqa: F401
    StreamConfig,
    host_rate_metrics,
    run_frontier_stream,
)
from .stateful_pacer import paced_admissions  # noqa: F401
