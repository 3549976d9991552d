"""Utilities: profiling, metrics, misc host helpers."""

from speechsplit_tpu.utils.profiling import StepTimer, profile_trace

__all__ = ["StepTimer", "profile_trace"]
