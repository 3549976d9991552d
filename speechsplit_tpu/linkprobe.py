"""Host<->device link probing for adaptive fetch policies.

This environment's tunneled TPU moves results at ~20-45 MB/s with the
rate drifting on ~minutes timescales and DEPENDING ON DTYPE (measured
f32 29.1, bf16 20.7 MB/s on the same element count — halving bytes buys
~1.4x, not 2x; BENCHMARKS.md). Whether compressing result fetches to
bfloat16 helps is therefore a property of the link *weather* and of how
compute-bound the stream is — a static flag was measured to win on two
windows and LOSE 15% on a third (VERDICT r3 weak #5). This module gives
callers the probe; the stream drivers (convert_stream) additionally
self-tune inline, which subsumes the probe when there is a stream to
measure.

Probe methodology (the hard-won rules from BENCHMARKS.md):
- fetch FRESH computation outputs — ``np.asarray`` on an undonated
  array CACHES the host copy, so re-fetching reads ~100 GB/s;
- subtract the round-trip latency measured with a scalar fetch, so the
  rate reflects bandwidth, not the ~4-35 ms RTT;
- the FIRST transfer of a fresh process costs ~90 s (session setup):
  callers are expected to have warmed the link already (any prior
  compile/step does); ``probe_link`` itself runs a tiny warm fetch
  first so it is safe to call cold, just slow.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional


class LinkProfile(NamedTuple):
    f32_mbps: float
    bf16_mbps: float
    rtt_ms: float


_CACHED: Optional[LinkProfile] = None


def probe_link(size_mb: float = 2.0, force: bool = False) -> LinkProfile:
    """Measure fetch bandwidth per dtype + RTT; cached per process.

    ``force=True`` re-measures AND drops every decision derived from
    the stale profile (convert's compress_fetch="auto" cache) — link
    bandwidth drifts on ~minutes timescales, so long-running services
    should call this periodically to re-decide (ADVICE r4).
    """
    global _CACHED
    if _CACHED is not None and not force:
        return _CACHED
    if force:
        # invalidate downstream caches keyed on the old profile; lazy
        # via sys.modules to avoid a circular import (convert imports
        # this module inside convert_stream)
        import sys

        _conv = sys.modules.get("speechsplit_tpu.convert")
        if _conv is not None:
            _conv.reset_auto_decisions()
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(size_mb * 1e6 / 4)

    import functools

    @functools.partial(jax.jit, static_argnames=("dtype",))
    def fresh(key, dtype):
        x = jax.random.uniform(key, (n,))
        return (x + 1.0).astype(dtype)

    # warm the link + compile (tiny)
    _ = np.asarray(fresh(jax.random.PRNGKey(0), jnp.float32)[:8])

    def rtt():
        t0 = time.perf_counter()
        _ = float(jnp.asarray(1.0) + 1.0)
        return time.perf_counter() - t0

    rtt_s = min(rtt(), rtt())

    def rate(dtype, nbytes_per_elem, key):
        out = fresh(key, dtype)  # fresh output: no host-copy cache
        t0 = time.perf_counter()
        _ = np.asarray(out)
        dt = max(time.perf_counter() - t0 - rtt_s, 1e-6)
        return n * nbytes_per_elem / dt / 1e6

    k = jax.random.PRNGKey(1)
    # interleave dtypes (drift protection) and keep the best of two
    f32 = rate(jnp.float32, 4, jax.random.fold_in(k, 0))
    b16 = rate(jnp.bfloat16, 2, jax.random.fold_in(k, 1))
    f32 = max(f32, rate(jnp.float32, 4, jax.random.fold_in(k, 2)))
    b16 = max(b16, rate(jnp.bfloat16, 2, jax.random.fold_in(k, 3)))
    _CACHED = LinkProfile(round(f32, 2), round(b16, 2), round(rtt_s * 1e3, 2))
    return _CACHED


def choose_compress(
    bytes_f32: int,
    compute_s: Optional[float] = None,
    profile: Optional[LinkProfile] = None,
) -> bool:
    """Should a result of ``bytes_f32`` be fetched as bfloat16?

    bf16 wins when the f32 fetch time exceeds BOTH the bf16 fetch time
    (always true on this link: bytes halve, rate drops ~30%) AND —
    when the caller can estimate it — the overlapped device compute,
    because on a compute-bound stream the cast/lower-MB/s leg is pure
    cost. On a fast local link (real TPU hosts move GB/s) f32 wins
    outright: fetch is never the bottleneck, so don't round results.
    """
    p = profile or probe_link()
    t_f32 = bytes_f32 / (p.f32_mbps * 1e6)
    t_b16 = (bytes_f32 / 2) / (p.bf16_mbps * 1e6)
    if t_b16 >= t_f32:
        return False
    if compute_s is not None and t_f32 <= compute_s:
        return False  # compute-bound: compression can't raise throughput
    # no compute estimate: compress only when the fetch is slow enough
    # to plausibly dominate (tunnel-class links; ~>5 ms per result)
    return t_f32 > 5e-3
