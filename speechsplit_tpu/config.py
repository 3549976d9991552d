"""Typed configuration for speechsplit_tpu.

Replaces the reference's module-global TF-1.x ``HParams`` object
(reference: hparams.py:7-43, tfcompat/hparam.py) with a frozen dataclass.
Field names intentionally match the reference's keys so that configs and
papers can be cross-read; a ``parse("k=v,...")`` override shim keeps CLI
parity with ``HParams.parse`` (reference: tfcompat/hparam.py:523-544).

Cleanups vs the reference (documented, deliberate):
- the ``samplier`` typo (hparams.py:41) becomes ``n_repeats`` (an alias is
  accepted by :meth:`SpeechSplitConfig.parse` for compatibility);
- dead keys ``dim_dec`` / ``len_raw`` (hparams.py:23-24) are dropped;
- new TPU-specific knobs live in their own section (dtype policy, mesh).
"""

from __future__ import annotations

import ast
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass(frozen=True)
class SpeechSplitConfig:
    # --- model bottlenecks (reference: hparams.py:9-18) -------------------
    # content (sync) encoder
    freq: int = 8          # content code downsample stride
    dim_neck: int = 8      # content bottleneck width (per direction)
    dim_enc: int = 512     # content conv-stack channels
    # rhythm encoder
    freq_2: int = 8
    dim_neck_2: int = 1
    dim_enc_2: int = 128
    # pitch (F0) encoder
    freq_3: int = 8
    dim_neck_3: int = 32
    dim_enc_3: int = 256

    # --- feature geometry (reference: hparams.py:20-25) -------------------
    dim_freq: int = 80        # mel bins
    dim_spk_emb: int = 82     # speaker one-hot / embedding size
    dim_f0: int = 257         # quantized log-F0 bins (256 + unvoiced)
    chs_grp: int = 16         # channels per GroupNorm group

    # --- random-resampling augmentation (reference: hparams.py:27-32) -----
    min_len_seg: int = 19
    max_len_seg: int = 32
    min_len_seq: int = 64
    max_len_seq: int = 128
    max_len_pad: int = 192

    # --- decoder widths (reference: model.py:244-247, 268-271) ------------
    dim_dec_mel: int = 512    # mel decoder LSTM hidden per direction
    dim_dec_f0: int = 256     # F0 decoder LSTM hidden per direction

    # --- audio front-end (reference: make_spect_f0.py:15-17, utils.py:18) -
    sample_rate: int = 16000
    fft_length: int = 1024
    hop_length: int = 256
    mel_fmin: float = 90.0
    mel_fmax: float = 7600.0
    highpass_cutoff_hz: float = 30.0
    highpass_order: int = 5
    ref_level_db: float = 16.0
    min_level_db: float = -100.0

    # --- data pipeline (reference: hparams.py:34-42) ----------------------
    root_dir: str = "assets/spmel"
    feat_dir: str = "assets/raptf0"
    wav_dir: str = "assets/wavs"
    batch_size: int = 16
    mode: str = "train"
    shuffle: bool = True
    n_repeats: int = 8        # reference: `samplier` (sic), hparams.py:41

    # --- training (reference: main.py:41-44) -------------------------------
    learning_rate: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    # --- TPU-native knobs (no reference counterpart) -----------------------
    compute_dtype: str = "float32"   # "float32" | "bfloat16" matmul inputs
    # dtype the LSTM kernels save backward residuals (gates/c) in.
    # bfloat16 halves the dominant residual HBM traffic: 5.41 -> 5.04
    # ms/step at the reference geometry (+7%), with loss trajectories
    # matching float32 residuals to ~1e-4 relative over 400 steps
    # (BENCHMARKS.md). "float32" restores bit-identical gradients vs
    # the lax.scan path (the exact-parity tests pin it).
    residual_dtype: str = "bfloat16"
    # "default": single-pass bf16 multiply on the MXU (fast path);
    # "highest": full f32 multiplies (~2x recurrence cost, strict
    # numerics — see PARITY.md #7)
    matmul_precision: str = "default"
    # dtype of Adam's FIRST-moment accumulator (optax mu_dtype).
    # "bfloat16" halves mu's read+write HBM traffic in the update
    # fusion (the optimizer moves 7 f32 words/param/step otherwise).
    # mu tolerates bf16 because its EMA increment is 10% relative
    # (b1=0.9), well above bf16's 2^-8 epsilon; nu does NOT (0.1%
    # increments would round away — nu stays f32 always), and params
    # stay f32 master weights. Hardware A/B (BENCHMARKS.md): ~1% step
    # win at the batch 32-40 throughput points (new best 824k
    # frames/s), noise at batch 16, loss identical to 6 decimals.
    # "float32" restores the exact optax reference accumulator.
    adam_mu_dtype: str = "bfloat16"
    # dtype the gradient tree is cast to between backward and the Adam
    # update. "bfloat16" sinks the casts into the grad producers (XLA
    # fuses converts into dot/conv outputs), halving the grad tree's
    # HBM write+read; ~0.4% relative rounding on each gradient, i.e.
    # far below gradient noise — but OFF by default pending the same
    # A/B + trajectory-equivalence bar every numerics default here has
    # passed (BENCHMARKS.md). In the shard_map step the cast happens
    # BEFORE the pmean, halving collective bytes too.
    grad_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    # speaker conditioning: "onehot" reproduces the reference's fixed
    # per-speaker one-hot slots (make_metadata.py:20-24); "learned"
    # adds a jointly-trained utterance-level speaker encoder
    # (models/encoders.py::SpeakerEncoder) enabling ZERO-SHOT timbre
    # targets — the upgrade the reference's own make_metadata.py:19
    # comment anticipates. The embedding width stays dim_spk_emb, so
    # decoder geometry and checkpoints are unaffected by the mode.
    spk_emb_mode: str = "onehot"
    dim_spk_enc: int = 256           # SpeakerEncoder conv channels
    # Auxiliary supervised-contrastive loss on the learned speaker
    # embeddings (learned mode only; ignored in onehot mode). The
    # round-4 zero-shot evaluation showed the reconstruction loss
    # alone gives the SpeakerEncoder no metric-learning pressure:
    # unseen-speaker outputs landed between training centroids
    # (QUALITY.md, VERDICT r4 #6). With weight > 0 the train step adds
    # weight * SupCon(embeddings, speaker labels) — same-speaker
    # embeddings attract, different-speaker embeddings repel on the
    # unit sphere (labels come free from the batch's one-hot rows,
    # which learned mode still loads). 0.0 = exactly the round-4
    # recipe (default; flipping it is an experiment, QUALITY.md).
    spk_contrast_weight: float = 0.0
    spk_contrast_temp: float = 0.1   # SupCon softmax temperature

    # ------------------------------------------------------------------ api
    @property
    def max_num_seg(self) -> int:
        """Static upper bound on resampling segments per sequence.

        Reference: model.py:365 (``max_len_seq // min_len_seg + 1``).
        """
        return self.max_len_seq // self.min_len_seg + 1

    @property
    def dim_code(self) -> int:
        """Concatenated decoder-input width (reference: model.py:244)."""
        return (
            2 * self.dim_neck
            + 2 * self.dim_neck_2
            + 2 * self.dim_neck_3
            + self.dim_spk_emb
        )

    _ALIASES = {
        "samplier": "n_repeats",       # reference typo, hparams.py:41
        "num_workers": None,           # meaningless here; accepted+ignored
        "dim_dec": "dim_dec_mel",      # reference dead key, hparams.py:23
        "len_raw": None,               # reference dead key, hparams.py:24
    }

    def parse(self, spec: str) -> "SpeechSplitConfig":
        """Apply ``"key=value,key=value"`` overrides, HParams.parse-style.

        Values are parsed as Python literals when possible, else kept as
        strings. List/tuple values are supported with the reference's
        grammar (``"a=1,b=[2,3]"``, tfcompat/hparam.py:523): the comma
        split is bracket-aware, so commas inside ``[]``/``()``/``{}`` or
        quotes do not terminate an override. Unknown keys raise
        ``ValueError``; reference-era aliases are translated
        (see ``_ALIASES``).
        """
        if not spec:
            return self
        updates: dict[str, Any] = {}
        for item in _split_overrides(spec):
            if not item.strip():
                continue
            if "=" not in item:
                raise ValueError(f"malformed override {item!r}; expected k=v")
            key, value = item.split("=", 1)
            key = key.strip()
            if key in self._ALIASES:
                key = self._ALIASES[key]
                if key is None:
                    continue
            if key not in {f.name for f in dataclasses.fields(self)}:
                raise ValueError(f"unknown config key {key!r}")
            try:
                parsed = ast.literal_eval(value.strip())
            except (ValueError, SyntaxError):
                parsed = value.strip()
            if isinstance(parsed, list) and isinstance(
                getattr(self, key), tuple
            ):
                parsed = tuple(parsed)  # e.g. mesh_shape=[2,4]
            updates[key] = parsed
        return dataclasses.replace(self, **updates)

    def replace(self, **kwargs: Any) -> "SpeechSplitConfig":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "SpeechSplitConfig":
        raw = json.loads(text)
        raw["mesh_shape"] = tuple(raw.get("mesh_shape", (1,)))
        raw["mesh_axes"] = tuple(raw.get("mesh_axes", ("data",)))
        return cls(**raw)

    def debug_string(self) -> str:
        """Human-readable dump (reference: hparams.py:46-49)."""
        lines = [
            f"  {f.name}: {getattr(self, f.name)}"
            for f in dataclasses.fields(self)
        ]
        return "Hyperparameters:\n" + "\n".join(lines)


def _split_overrides(spec: str) -> list[str]:
    """Split ``"a=1,b=[2,3],c='x,y'"`` on top-level commas only.

    Mirrors the list grammar of the reference's ``HParams.parse``
    (tfcompat/hparam.py:523): commas nested inside brackets or quotes are
    part of the value, not separators.
    """
    items: list[str] = []
    depth = 0
    quote: str | None = None
    start = 0
    for i, ch in enumerate(spec):
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0:
            items.append(spec[start:i])
            start = i + 1
    items.append(spec[start:])
    return items


def resolve_dtype(name: str):
    """Map a dtype config string (``compute_dtype``/``residual_dtype``)
    to a jnp dtype (imported lazily so the config module stays
    importable without initializing JAX)."""
    import jax.numpy as jnp

    table = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
    if name not in table:
        raise ValueError(
            f"dtype must be one of {sorted(table)}, got {name!r}"
        )
    return table[name]


def default_config() -> SpeechSplitConfig:
    return SpeechSplitConfig()
