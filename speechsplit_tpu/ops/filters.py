"""IIR filtering on device: Butterworth high-pass + zero-phase filtfilt.

The reference applies a 5th-order Butterworth high-pass at 30 Hz with
``scipy.signal.filtfilt`` on the host, one file at a time
(utils.py:10-14, make_spect_f0.py:17,54). Here the recurrence runs as a
``lax.scan`` (sequential by nature, but batched over utterances via
``vmap``) with scipy-equivalent semantics: odd-extension padding and
steady-state initial conditions.

Numerics: the filter is realized as cascaded second-order sections
(direct-form II transposed). The reference's single (b, a) realization is
numerically unstable in float32 for a 30 Hz/16 kHz high-pass (pole radius
~0.9987 — it NaNs); the SOS cascade is stable and matches scipy's
``filtfilt(b, a, ·)`` to ~3e-7 in float64. Coefficient design and
steady-state solves stay on the host (tiny, once per config).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal

Array = jax.Array


def butter_highpass(
    cutoff: float, fs: float, order: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Design a Butterworth high-pass, (b, a) form (ref: utils.py:10-14)."""
    nyq = 0.5 * fs
    b, a = sp_signal.butter(order, cutoff / nyq, btype="high", analog=False)
    return b.astype(np.float64), a.astype(np.float64)


def butter_highpass_sos(cutoff: float, fs: float, order: int = 5) -> np.ndarray:
    """Same filter as second-order sections ``[n_sections, 6]``."""
    nyq = 0.5 * fs
    return sp_signal.butter(
        order, cutoff / nyq, btype="high", analog=False, output="sos"
    )


def sosfilt(sos: Array, x: Array, zi: Array) -> Array:
    """Cascaded-biquad IIR along the last axis.

    sos: [S, 6] (a0 normalized to 1). x: [N]. zi: [S, 2] initial state.
    One lax.scan over samples; per step each section is 4 mul-adds —
    latency-bound, so batch signals with vmap (lanes ride the VPU).
    """
    n_sections = sos.shape[0]
    b = sos[:, :3]
    a = sos[:, 4:6]  # a1, a2

    def step(z, xt):
        zs = []
        cur = xt
        for s in range(n_sections):
            y = b[s, 0] * cur + z[s, 0]
            z0 = b[s, 1] * cur + z[s, 1] - a[s, 0] * y
            z1 = b[s, 2] * cur - a[s, 1] * y
            zs.append(jnp.stack([z0, z1]))
            cur = y
        return jnp.stack(zs), cur

    _, y = jax.lax.scan(step, zi, x)
    return y


@functools.partial(jax.jit, static_argnames=("padlen",))
def _sosfiltfilt_core(sos: Array, zi: Array, x: Array, padlen: int) -> Array:
    # odd extension (scipy filtfilt/sosfiltfilt default padtype='odd')
    left = 2.0 * x[0] - x[1 : padlen + 1][::-1]
    right = 2.0 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([left, x, right])

    y = sosfilt(sos, ext, zi * ext[0])
    y = y[::-1]
    y = sosfilt(sos, y, zi * y[0])
    y = y[::-1]
    return y[padlen : padlen + x.shape[0]]


def sosfiltfilt(sos: np.ndarray, x: Array, padlen: int | None = None) -> Array:
    """Zero-phase filtering matching scipy's defaults. x: [N]; vmap to batch."""
    if padlen is None:
        # scipy sosfiltfilt default: ntaps shrinks by trailing zero coeffs
        padlen = 3 * (
            2 * sos.shape[0]
            + 1
            - min(int((sos[:, 2] == 0).sum()), int((sos[:, 5] == 0).sum()))
        )
    zi = jnp.asarray(sp_signal.sosfilt_zi(sos), dtype=x.dtype)
    return _sosfiltfilt_core(jnp.asarray(sos, x.dtype), zi, x, padlen)


# (b, a)-form path kept for float64 oracle comparisons ---------------------


def lfilter(b: Array, a: Array, x: Array, zi: Array) -> Array:
    """Direct-form II transposed IIR along the last axis (float64 only —
    the (b, a) realization of steep high-passes NaNs in float32)."""

    def step(z, xt):
        yt = b[0] * xt + z[0]
        z_new = (
            b[1:] * xt
            + jnp.concatenate([z[1:], jnp.zeros((1,), z.dtype)])
            - a[1:] * yt
        )
        return z_new, yt

    _, y = jax.lax.scan(step, zi, x)
    return y


@functools.partial(jax.jit, static_argnames=("padlen",))
def _filtfilt_core(b: Array, a: Array, zi: Array, x: Array, padlen: int) -> Array:
    left = 2.0 * x[0] - x[1 : padlen + 1][::-1]
    right = 2.0 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([left, x, right])
    y = lfilter(b, a, ext, zi * ext[0])
    y = y[::-1]
    y = lfilter(b, a, y, zi * y[0])
    y = y[::-1]
    return y[padlen : padlen + x.shape[0]]


def filtfilt(
    b: np.ndarray, a: np.ndarray, x: Array, padlen: int | None = None
) -> Array:
    """scipy.signal.filtfilt semantics, (b, a) realization."""
    if padlen is None:
        padlen = 3 * max(len(a), len(b))
    zi = jnp.asarray(sp_signal.lfilter_zi(b, a), dtype=x.dtype)
    return _filtfilt_core(
        jnp.asarray(b, x.dtype), jnp.asarray(a, x.dtype), zi, x, padlen
    )


def highpass_filtfilt(
    x: Array, cutoff: float = 30.0, fs: float = 16000.0, order: int = 5
) -> Array:
    """The reference's zero-phase high-pass (make_spect_f0.py:17,54),
    realized stably in float32 via SOS. Sequential scan — prefer
    :func:`zero_phase_highpass` on TPU."""
    sos = butter_highpass_sos(cutoff, fs, order)
    return sosfiltfilt(sos, x)


# Production TPU path: frequency-domain zero-phase filtering --------------
#
# filtfilt applies |H(w)|^2 with zero phase; on TPU we realize that with
# one rfft/irfft pair instead of a 2N-step sequential scan. With odd-
# extension padding >= the filter's settle time this matches scipy's
# filtfilt-with-large-padlen to ~3e-7 — i.e. it *removes* the edge
# transient that scipy's default padlen=18 leaves behind for a 30 Hz
# high-pass (a documented improvement over the reference, whose
# make_spect_f0.py:54 uses the too-short default).


@functools.lru_cache(maxsize=8)
def _zero_phase_response(
    cutoff: float, fs: float, order: int, n: int
) -> np.ndarray:
    b, a = butter_highpass(cutoff, fs, order)
    freqs = np.fft.rfftfreq(n) * 2.0 * np.pi
    _, h = sp_signal.freqz(b, a, worN=freqs)
    return (h * np.conj(h)).real.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("cutoff", "fs", "order", "pad")
)
def zero_phase_highpass(
    x: Array,
    lengths: Array,
    *,
    cutoff: float = 30.0,
    fs: float = 16000.0,
    order: int = 5,
    pad: int = 8192,
) -> Array:
    """Batched zero-phase Butterworth high-pass via rfft (TPU fast path).

    Args:
      x: ``[B, N]`` zero-padded signals (N static).
      lengths: ``[B]`` true lengths (>= 2); samples past each length are
        ignored and zeroed in the output.
      pad: odd-extension length; 8192 samples @16 kHz covers the 30 Hz
        filter's impulse-response decay (pole radius ^8192 ≈ 3e-5).
    Returns ``[B, N]`` filtered signals (zero past each true length).
    """
    batch, n_in = x.shape
    n = 1 << (n_in + 2 * pad - 1).bit_length()
    h2 = jnp.asarray(_zero_phase_response(cutoff, fs, order, n))

    lengths = lengths.astype(jnp.int32)
    last = lengths[:, None] - 1  # [B, 1]
    j = (jnp.arange(n) - pad)[None, :]  # [B?, n] ext-relative index

    left = j < 0
    right = j > last
    src = jnp.where(left, -j, jnp.where(right, 2 * last - j, j))
    src_c = jnp.clip(src, 0, n_in - 1)
    vals = jnp.take_along_axis(x, src_c, axis=1)

    x0 = x[:, :1]
    x_last = jnp.take_along_axis(x, last, axis=1)
    anchor = jnp.where(left, x0, x_last)
    ext = jnp.where(left | right, 2.0 * anchor - vals, vals)
    # keep only one reflection span on each side; zero elsewhere so no
    # garbage rides the circular convolution
    in_span = (j > -(last + 1)) & (j < 2 * last + 1) & (src >= 0) & (
        src <= last
    )
    ext = jnp.where(in_span, ext, 0.0)

    spec = jnp.fft.rfft(ext, n=n, axis=1)
    y = jnp.fft.irfft(spec * h2[None, :], n=n, axis=1)
    y = y[:, pad : pad + n_in]
    frame_ix = jnp.arange(n_in)[None, :]
    return jnp.where(frame_ix < lengths[:, None], y, 0.0).astype(x.dtype)
