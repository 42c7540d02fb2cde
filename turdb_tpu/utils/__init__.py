"""Cross-cutting utilities: timing counters, profiling hooks."""

from turdb_tpu.utils.timing import TIMERS, timed, timing_stats  # noqa: F401
