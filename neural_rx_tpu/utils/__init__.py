"""Auxiliary subsystems: profiling, debug tooling, experiment registry
(SURVEY.md §5 — the reference delegates these to trtexec/TensorBoard;
here they are first-class library utilities)."""

from .profiling import profile_trace, time_fn
from .debug import nan_guard, debug_context
