"""Small utilities: step timer, profile-trace no-op, compile cache."""

import time

from speechsplit_tpu.utils import enable_compile_cache
from speechsplit_tpu.utils.profiling import StepTimer, profile_trace


def test_step_timer_converges():
    timer = StepTimer(ema=0.5)
    assert timer.avg is None
    for _ in range(8):
        timer.tick()
        time.sleep(0.01)
    assert 30 < timer.steps_per_sec < 300


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass
    with profile_trace(""):
        pass  # both must be no-ops, no profiler session started


def test_enable_compile_cache_disabled_by_empty(monkeypatch):
    monkeypatch.setenv("SPEECHSPLIT_JAX_CACHE", "")
    enable_compile_cache()  # must be a no-op, not crash


def test_enable_compile_cache_sets_config(tmp_path):
    import jax

    enable_compile_cache(str(tmp_path))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)
