"""Length-mask and padding utilities (reference: utils.py:78-87)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_mask_from_lengths(lengths: Array, max_len: int) -> Array:
    """Boolean padding mask: True at padded positions (ref: utils.py:78-81)."""
    ids = jnp.arange(max_len)
    return ids[None, :] >= lengths[:, None]


def pad_time_axis(x: np.ndarray, len_out: int) -> tuple[np.ndarray, int]:
    """Right-pad ``[B, T, C]`` to ``[B, len_out, C]`` (ref: utils.py:85-87)."""
    len_pad = len_out - x.shape[1]
    assert len_pad >= 0, f"sequence longer than pad target: {x.shape[1]}"
    return np.pad(x, ((0, 0), (0, len_pad), (0, 0)), "constant"), len_pad
