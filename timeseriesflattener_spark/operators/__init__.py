from .asof import asof_join
from .rolling import counter_increase, downsample_m4, rolling_stats
from .sessions import session_stats, sessionize
from .static import process_static_spec
from .temporal import process_temporal_spec
from .timedelta import process_timedelta_spec

__all__ = [
    "asof_join",
    "process_static_spec",
    "process_temporal_spec",
    "process_timedelta_spec",
    "session_stats",
    "sessionize",
]
