"""Two-way interop with reference PyTorch checkpoints.

Import: the reference ships pretrained checkpoints (``660000-G.ckpt``
for the generator, ``640000-P.ckpt`` for the F0 converter — reference
README.md:38, demo.ipynb cell-0) whose ``state_dict`` layout follows
reference model.py. :func:`torch_state_dict_to_params` maps those
tensors onto this framework's flax param tree so the checkpoints can
seed parity tests and warm-start inference.

Export: :func:`params_to_torch_state_dict` inverts the mapping, so a
model trained BY THIS FRAMEWORK can be saved as a reference-format
``.ckpt`` (:func:`save_reference_checkpoint`) and loaded by the
reference ``Solver.restore_model``/demo notebook unchanged (reference
solver.py:84-90 reads ``ckpt['model']``). Only model weights are
exported — optimizer state is not portable (optax vs torch Adam keep
different step/moment layouts), matching how the reference's own demo
consumes checkpoints (``ckpt['model']`` only).

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


def _get(tree: Mapping[str, Any], path: list[str]) -> np.ndarray:
    node: Any = tree
    for part in path:
        node = node[part]
    return np.asarray(node, dtype=np.float32)


_LSTM_OUT_RE = re.compile(r"(w|b)_(ih|hh)_l(\d+)(_reverse)?$")


def params_to_torch_state_dict(
    params: Mapping[str, Any], model: str = "speechsplit"
) -> Dict[str, np.ndarray]:
    """Convert a flax params dict back to reference state_dict layout.

    Exact inverse of :func:`torch_state_dict_to_params` (round-trip is
    bit-identical — tests/test_models.py). Returns numpy arrays keyed
    by the reference's torch parameter names (reference model.py
    module tree); pass through ``torch.from_numpy`` or
    :func:`save_reference_checkpoint` to obtain a loadable ``.ckpt``.

    Raises ``ValueError`` when ``params`` holds subtrees with no
    reference counterpart (e.g. the learned-mode ``speaker_encoder`` —
    zero-shot checkpoints have no reference-format equivalent because
    the reference hard-codes one-hot embeddings, make_metadata.py:19).
    """
    params = params.get("params", params)  # accept {'params': ...} too
    module_map = (
        _module_map_generator()
        if model == "speechsplit"
        else _module_map_f0_converter()
    )
    out: Dict[str, np.ndarray] = {}
    consumed = set()
    for prefix, (path, kind) in module_map.items():
        node = _get_node(params, path)
        consumed.add(tuple(path))
        if kind == "conv":
            out[prefix + ".weight"] = _get(node, ["kernel"]).transpose(
                2, 1, 0
            )  # [k,in,out] -> [out,in,k]
            out[prefix + ".bias"] = _get(node, ["bias"])
        elif kind == "norm":
            out[prefix + ".weight"] = _get(node, ["scale"])
            out[prefix + ".bias"] = _get(node, ["bias"])
        elif kind == "linear":
            out[prefix + ".weight"] = _get(node, ["kernel"]).T
            out[prefix + ".bias"] = _get(node, ["bias"])
        elif kind == "lstm":
            for name in node:
                m = _LSTM_OUT_RE.match(name)
                if not m:
                    raise ValueError(
                        f"unrecognized LSTM param {name!r} at {path}"
                    )
                kind_c, gate_side, layer, rev = m.groups()
                suffix = f"l{layer}" + (rev or "")
                arr = _get(node, [name])
                if kind_c == "w":
                    out[f"{prefix}.weight_{gate_side}_{suffix}"] = arr.T
                else:
                    out[f"{prefix}.bias_{gate_side}_{suffix}"] = arr
    extra = _unconsumed_paths(params, consumed)
    if extra:
        raise ValueError(
            "params contain subtrees with no reference counterpart: "
            f"{sorted(extra)} (learned-mode speaker encoders cannot be "
            "exported to the one-hot reference format)"
        )
    return out


def _get_node(tree: Mapping[str, Any], path: list[str]) -> Mapping[str, Any]:
    node: Any = tree
    for part in path:
        if part not in node:
            raise ValueError(
                f"params missing expected module {'/'.join(path)!r}"
            )
        node = node[part]
    return node


def _unconsumed_paths(params: Mapping[str, Any], consumed: set) -> set:
    """Module paths (depth-2, matching the module maps) not exported."""
    extra = set()
    for top, sub in params.items():
        if not isinstance(sub, Mapping):
            extra.add(top)
            continue
        for name in sub:
            if (top, name) not in consumed:
                extra.add(f"{top}/{name}")
    return extra


def save_reference_checkpoint(
    params: Mapping[str, Any], path: str, model: str = "speechsplit"
) -> None:
    """Save flax params as a reference-loadable ``.ckpt`` (requires torch).

    The file holds ``{'model': state_dict}`` exactly as the reference
    training loop writes (solver.py:198-202) and its ``restore_model``/
    demo notebook read (solver.py:84-90)."""
    import torch  # local import: only needed for this entry point

    state = {
        # copy: orbax-restored arrays can be non-writable views, which
        # torch.from_numpy refuses to own
        k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
        for k, v in params_to_torch_state_dict(params, model=model).items()
    }
    torch.save({"model": state}, path)
