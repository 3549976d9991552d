"""One-way import of reference PyTorch checkpoints into param pytrees.

The reference ships pretrained checkpoints (``660000-G.ckpt`` for the
generator, ``640000-P.ckpt`` for the F0 converter — reference README.md:38,
demo.ipynb cell-0) whose ``state_dict`` layout follows reference model.py.
This module maps those tensors onto this framework's flax param tree so
the checkpoints can seed parity tests and warm-start inference.

Layout differences handled here:
- Linear:  torch ``[out, in]``            -> ours ``[in, out]`` (transpose)
- Conv1d:  torch ``[out, in, k]``         -> ours ``[k, in, out]``
- LSTM:    torch ``weight_ih_l{l}[4H, I]`` -> ``w_ih_l{l}[I, 4H]`` etc.;
           both bias vectors are kept (summed at apply time, same math).

Only numpy arrays flow through — no torch import is required unless the
caller starts from an actual ``.ckpt`` file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _set(tree: Dict[str, Any], path: list[str], value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


_LSTM_RE = re.compile(
    r"(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$"
)


def _convert_lstm_key(name: str, arr: np.ndarray):
    m = _LSTM_RE.match(name)
    if not m:
        raise ValueError(f"unrecognized LSTM param {name!r}")
    kind, gate_side, layer, rev = m.groups()
    suffix = f"l{layer}" + ("_reverse" if rev else "")
    if kind == "weight":
        return f"w_{gate_side}_{suffix}", arr.T
    return f"b_{gate_side}_{suffix}", arr


def _module_map_generator() -> Dict[str, tuple]:
    """torch submodule prefix -> (flax path prefix, kind)."""
    out: Dict[str, tuple] = {}
    for i in range(3):
        out[f"encoder_1.convolutions_1.{i}.0.conv"] = (
            ["encoder_content_pitch", f"conv_mel_{i}"], "conv")
        out[f"encoder_1.convolutions_1.{i}.1"] = (
            ["encoder_content_pitch", f"norm_mel_{i}"], "norm")
        out[f"encoder_1.convolutions_2.{i}.0.conv"] = (
            ["encoder_content_pitch", f"conv_f0_{i}"], "conv")
        out[f"encoder_1.convolutions_2.{i}.1"] = (
            ["encoder_content_pitch", f"norm_f0_{i}"], "norm")
    out["encoder_1.lstm_1"] = (
        ["encoder_content_pitch", "lstm_content"], "lstm")
    out["encoder_1.lstm_2"] = (
        ["encoder_content_pitch", "lstm_pitch"], "lstm")
    out["encoder_2.convolutions.0.0.conv"] = (
        ["encoder_rhythm", "conv_0"], "conv")
    out["encoder_2.convolutions.0.1"] = (
        ["encoder_rhythm", "norm_0"], "norm")
    out["encoder_2.lstm"] = (["encoder_rhythm", "lstm"], "lstm")
    out["decoder.lstm"] = (["decoder", "lstm"], "lstm")
    out["decoder.linear_projection.linear_layer"] = (
        ["decoder", "projection"], "linear")
    return out


def _module_map_f0_converter() -> Dict[str, tuple]:
    out: Dict[str, tuple] = {}
    out["encoder_2.convolutions.0.0.conv"] = (
        ["encoder_rhythm", "conv_0"], "conv")
    out["encoder_2.convolutions.0.1"] = (
        ["encoder_rhythm", "norm_0"], "norm")
    out["encoder_2.lstm"] = (["encoder_rhythm", "lstm"], "lstm")
    for i in range(3):
        out[f"encoder_3.convolutions.{i}.0.conv"] = (
            ["encoder_f0", f"conv_{i}"], "conv")
        out[f"encoder_3.convolutions.{i}.1"] = (
            ["encoder_f0", f"norm_{i}"], "norm")
    out["encoder_3.lstm"] = (["encoder_f0", "lstm"], "lstm")
    out["decoder.lstm"] = (["decoder", "lstm"], "lstm")
    out["decoder.linear_projection.linear_layer"] = (
        ["decoder", "projection"], "linear")
    return out


def torch_state_dict_to_params(
    state_dict: Mapping[str, Any], model: str = "speechsplit"
) -> Dict[str, Any]:
    """Convert a reference ``state_dict`` to a flax params dict.

    Args:
      state_dict: mapping of torch parameter names to arrays (torch
        tensors are accepted and converted via ``.numpy()``).
      model: ``"speechsplit"`` (Generator_3) or ``"f0_converter"``
        (Generator_6).
    """
    module_map = (
        _module_map_generator()
        if model == "speechsplit"
        else _module_map_f0_converter()
    )
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach")
            else value,
            dtype=np.float32,
        )
        matched = False
        for prefix, (path, kind) in module_map.items():
            if not key.startswith(prefix + "."):
                continue
            leaf = key[len(prefix) + 1 :]
            if kind == "conv":
                name = {"weight": "kernel", "bias": "bias"}[leaf]
                if leaf == "weight":
                    arr = arr.transpose(2, 1, 0)  # [out,in,k]->[k,in,out]
                _set(params, path + [name], arr)
            elif kind == "norm":
                name = {"weight": "scale", "bias": "bias"}[leaf]
                _set(params, path + [name], arr)
            elif kind == "linear":
                name = {"weight": "kernel", "bias": "bias"}[leaf]
                if leaf == "weight":
                    arr = arr.T
                _set(params, path + [name], arr)
            elif kind == "lstm":
                name, arr = _convert_lstm_key(leaf, arr)
                _set(params, path + [name], arr)
            matched = True
            break
        if not matched:
            # len_org buffers etc. carry no learnable state (ref:
            # model.py:105,157 register constant buffers)
            if key.endswith("len_org"):
                continue
            raise ValueError(f"unmapped reference parameter {key!r}")
    return params


def load_reference_checkpoint(path: str, model: str = "speechsplit"):
    """Load a reference ``.ckpt`` file (requires torch) into flax params."""
    import torch  # local import: only needed for this entry point

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    return torch_state_dict_to_params(state_dict, model=model)
