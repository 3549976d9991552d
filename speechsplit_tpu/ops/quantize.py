"""F0 quantization and speaker normalization (TPU-side, batched).

Reference semantics: utils.py:35-74. The reference keeps separate numpy
and torch variants (`quantize_f0_numpy` / `quantize_f0_torch`); here one
jittable, batch-shape-agnostic implementation serves both the data
pipeline and the in-train-step requantization (reference: solver.py:162).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_f0(x: Array, num_bins: int = 256) -> Array:
    """Quantize normalized log-F0 in [0, 1] to integer bins.

    Unvoiced frames are encoded as ``x <= 0`` (the pipeline pads with a
    large negative sentinel) and map to bin 0; voiced frames map to bins
    ``1 .. num_bins`` (ref: utils.py:46-58).

    Accepts any shape; returns int32 bin ids of the same shape.
    """
    uv = x <= 0.0
    xv = jnp.where(uv, 0.0, x)
    bins = jnp.round(xv * (num_bins - 1)) + 1.0
    return jnp.where(uv, 0, bins.astype(jnp.int32))


def quantize_f0_onehot(x: Array, num_bins: int = 256) -> Array:
    """Quantize and one-hot encode: ``[...]`` -> ``[..., num_bins+1]``.

    Matches the reference's 257-dim encoding (ref: utils.py:46-74).
    """
    ids = quantize_f0(x, num_bins)
    return jax.nn.one_hot(ids, num_bins + 1, dtype=jnp.float32)


def speaker_normalization(
    f0: Array, voiced: Array, mean_f0: Array, std_f0: Array
) -> Array:
    """Per-speaker normalize log-F0 to [0, 1] on voiced frames.

    ((f0 - mean)/std/4 clipped to [-1, 1] + 1) / 2 on voiced frames;
    unvoiced frames pass through unchanged (ref: utils.py:35-42).
    """
    norm = (f0 - mean_f0) / std_f0 / 4.0
    norm = jnp.clip(norm, -1.0, 1.0)
    norm = (norm + 1.0) / 2.0
    return jnp.where(voiced, norm, f0)
