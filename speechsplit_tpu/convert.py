"""Voice-conversion inference: the 7-condition driver as a library API.

Re-designs the reference demo notebook's conversion cell (demo.ipynb
cell-0) as jitted library functions. The seven conditions swap subsets of
{Rhythm, F0, timbre (U)} between a source and target utterance:

  condition   content-path input      rhythm input   speaker emb
  R           src mel + src F0        TARGET mel     src
  F           src mel + CONVERTED F0  src mel        src
  U           src mel + src F0        src mel        TARGET
  RF/RU/FU/RFU: the corresponding combinations

'Converted F0' comes from the F0 converter: predict the 257-bin contour
of the source mel under the target's pitch, take the argmax and re-one-hot
(straight-through), exactly as the demo does.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.models import F0Converter, SpeechSplit
from speechsplit_tpu.ops.masks import pad_time_axis
from speechsplit_tpu.ops.quantize import quantize_f0_onehot

Array = jax.Array

CONDITIONS = ("R", "F", "U", "RF", "RU", "FU", "RFU")


class Utterance(NamedTuple):
    """One prepared utterance, padded to max_len_pad."""

    mel: Array       # [1, T_pad, 80]
    f0_onehot: Array  # [1, T_pad, 257]
    length: int
    spk_emb: Array   # [1, 82]
    name: str = ""
    uid: str = ""


def prepare_utterance(
    config: SpeechSplitConfig,
    mel: np.ndarray,
    f0: np.ndarray,
    spk_emb: np.ndarray,
    name: str = "",
    uid: str = "",
) -> Utterance:
    """Pad mel/F0 and one-hot the contour (demo.ipynb cell-0 prep)."""
    length = len(mel)
    mel_pad, _ = pad_time_axis(
        np.asarray(mel, np.float32)[None], config.max_len_pad
    )
    f0_pad = np.pad(
        np.asarray(f0, np.float64), (0, config.max_len_pad - length)
    )
    onehot = np.asarray(
        quantize_f0_onehot(jnp.asarray(f0_pad), config.dim_f0 - 1)
    )[None]
    emb = np.asarray(spk_emb, np.float32).reshape(1, -1)
    return Utterance(
        mel=jnp.asarray(mel_pad),
        f0_onehot=jnp.asarray(onehot),
        length=length,
        spk_emb=jnp.asarray(emb),
        name=name,
        uid=uid,
    )


@functools.partial(jax.jit, static_argnames=("module",))
def _embed_speaker_jit(module, params, mel):
    return module.apply({"params": params}, mel, method="embed_speaker")


def with_learned_embedding(
    config: SpeechSplitConfig,
    module: SpeechSplit,
    params,
    utt: Utterance,
) -> Utterance:
    """Zero-shot conversion targets for learned-mode checkpoints.

    When the generator was trained with ``spk_emb_mode="learned"`` the
    decoder expects SpeakerEncoder(mel) embeddings, not the metadata
    one-hots (which come from a distribution the model never saw).
    Replaces the utterance's spk_emb with its own mel's embedding —
    this is what makes conversion ZERO-SHOT: any speaker's utterance
    becomes a valid timbre target without retraining or metadata slots.
    No-op for one-hot-mode configs, so callers can apply unconditionally.
    """
    if config.spk_emb_mode != "learned":
        return utt
    emb = _embed_speaker_jit(module, params, utt.mel)
    return utt._replace(spk_emb=emb)


@functools.partial(jax.jit, static_argnames=("module",))
def _f0_convert_jit(module, params, mel_src, f0_trg_onehot):
    logits = module.apply({"params": params}, mel_src, f0_trg_onehot)
    ids = jnp.argmax(logits, axis=-1)  # [1, T]
    return jax.nn.one_hot(ids, logits.shape[-1], dtype=jnp.float32)


def convert_f0(
    module: F0Converter, params, src: Utterance, trg: Utterance
) -> Array:
    """Source rhythm + target pitch -> converted one-hot contour."""
    return _f0_convert_jit(module, params, src.mel, trg.f0_onehot)


@functools.partial(jax.jit, static_argnames=("module",))
def _generate_jit(module, params, x_f0, x_org, emb):
    return module.apply({"params": params}, x_f0, x_org, emb)


def convert(
    g_module: SpeechSplit,
    g_params,
    p_module: F0Converter,
    p_params,
    src: Utterance,
    trg: Utterance,
    conditions: Sequence[str] = CONDITIONS,
) -> List[Tuple[str, np.ndarray]]:
    """Run the requested conversion conditions.

    Returns (name, mel [T, 80]) pairs, trimmed to the target length when
    rhythm was converted, else to the source length (demo.ipynb cell-0).
    """
    x_f0_org = jnp.concatenate([src.mel, src.f0_onehot], axis=-1)
    f0_con = convert_f0(p_module, p_params, src, trg)
    x_f0_con = jnp.concatenate([src.mel, f0_con], axis=-1)

    results = []
    for condition in conditions:
        x_f0 = x_f0_con if "F" in condition else x_f0_org
        x_org = trg.mel if "R" in condition else src.mel
        emb = trg.spk_emb if "U" in condition else src.spk_emb
        out = _generate_jit(g_module, g_params, x_f0, x_org, emb)
        cut = trg.length if "R" in condition else src.length
        name = f"{src.name}_{trg.name}_{src.uid}_{condition}"
        results.append((name, np.asarray(out[0, :cut, :])))
    return results


def _convert_submit(
    g_module: SpeechSplit,
    g_params,
    p_module: F0Converter,
    p_params,
    pairs: Sequence[Tuple[Utterance, Utterance]],
    conditions: Sequence[str],
    compress_fetch: bool,
    start_copy: bool = True,
):
    """Dispatch the (pair x condition) grid; returns the in-flight
    device array (async — nothing is fetched here) plus the metadata
    needed to format results later.

    ``start_copy=False`` skips the early device->host copy — used by
    the auto-mode probe dispatches, whose scalar compute fence must not
    share the link with a multi-MB grid copy (the copy inflates the
    measured compute time to ~the fetch time and flips the decision —
    BENCHMARKS.md "Adaptive fetch", window-2 failure)."""
    mel_src = jnp.concatenate([s.mel for s, _ in pairs], axis=0)
    mel_trg = jnp.concatenate([t.mel for _, t in pairs], axis=0)
    f0_src = jnp.concatenate([s.f0_onehot for s, _ in pairs], axis=0)
    f0_trg = jnp.concatenate([t.f0_onehot for _, t in pairs], axis=0)
    emb_src = jnp.concatenate([s.spk_emb for s, _ in pairs], axis=0)
    emb_trg = jnp.concatenate([t.spk_emb for _, t in pairs], axis=0)

    # one batched F0 conversion for every pair
    f0_con = _f0_convert_jit(p_module, p_params, mel_src, f0_trg)

    x_f0_org = jnp.concatenate([mel_src, f0_src], axis=-1)
    x_f0_con = jnp.concatenate([mel_src, f0_con], axis=-1)

    # build the (pair x condition) grid
    xs, orgs, embs = [], [], []
    for condition in conditions:
        xs.append(x_f0_con if "F" in condition else x_f0_org)
        orgs.append(mel_trg if "R" in condition else mel_src)
        embs.append(emb_trg if "U" in condition else emb_src)
    out = _generate_jit(
        g_module,
        g_params,
        jnp.concatenate(xs, axis=0),
        jnp.concatenate(orgs, axis=0),
        jnp.concatenate(embs, axis=0),
    )  # [C * P, T, 80]

    # fetch-byte reduction on device: trim the time axis to the longest
    # frame count any (pair, condition) actually keeps, and optionally
    # round to bfloat16 (~0.2 dB, far below vocoder error)
    cut_max = max(
        (t.length if "R" in c else s.length)
        for c in conditions
        for (s, t) in pairs
    )
    out = out[:, :cut_max, :]
    if compress_fetch:
        out = out.astype(jnp.bfloat16)
    if start_copy:
        try:  # start the device->host copy early (overlaps later compute)
            out.copy_to_host_async()
        except AttributeError:
            pass
    return out, (list(pairs), tuple(conditions))


def _convert_fetch(out, meta) -> List[List[Tuple[str, np.ndarray]]]:
    """Block on one in-flight grid and format per-pair results."""
    pairs, conditions = meta
    p_count = len(pairs)
    out = np.asarray(out)
    if out.dtype != np.float32:
        out = out.astype(np.float32)
    results: List[List[Tuple[str, np.ndarray]]] = [[] for _ in pairs]
    for ci, condition in enumerate(conditions):
        for pi, (src, trg) in enumerate(pairs):
            cut = trg.length if "R" in condition else src.length
            name = f"{src.name}_{trg.name}_{src.uid}_{condition}"
            results[pi].append((name, out[ci * p_count + pi, :cut, :]))
    return results


def convert_batched(
    g_module: SpeechSplit,
    g_params,
    p_module: F0Converter,
    p_params,
    pairs: Sequence[Tuple[Utterance, Utterance]],
    conditions: Sequence[str] = CONDITIONS,
    compress_fetch: bool = False,
) -> List[List[Tuple[str, np.ndarray]]]:
    """Throughput-oriented conversion: all conditions of all pairs in
    single batched device calls.

    Where :func:`convert` runs one [1, T, .] forward per condition, this
    stacks every (pair, condition) combination into one
    ``[P * C, T, .]`` batch — one F0-converter call for the P pairs and
    one generator call for the whole grid — keeping the MXU fed. Returns
    per-pair lists matching :func:`convert`'s output format.

    ``compress_fetch=True`` casts the result grid to bfloat16 on device
    before the host fetch (results are upcast back to float32). On a
    slow host<->device link the fetch dominates end-to-end conversion
    throughput and this halves it; cost is bf16 rounding of the output
    mel — ~2e-3 absolute on the [0,1] normalized-dB scale (~0.2 dB),
    well under the built-in vocoder's ~0.6-1.1 dB resynthesis error.

    For sustained many-batch conversion use :func:`convert_stream`,
    which overlaps each batch's host fetch with the next batch's device
    compute.
    """
    out, meta = _convert_submit(
        g_module, g_params, p_module, p_params, pairs, conditions,
        compress_fetch,
    )
    return _convert_fetch(out, meta)


# compress_fetch="auto" decisions, keyed by grid shape + trimmed
# length; see convert_stream. Process-lifetime, like linkprobe's cached
# profile — linkprobe.probe_link(force=True) clears BOTH so long-lived
# services can re-decide under fresh link weather (ADVICE r4).
_AUTO_DECISIONS: dict = {}


def reset_auto_decisions() -> None:
    """Drop cached compress_fetch="auto" verdicts (e.g. after link
    weather changes); ``linkprobe.probe_link(force=True)`` calls this."""
    _AUTO_DECISIONS.clear()


def _auto_key(pairs, conditions) -> tuple:
    """Cache key for a compress_fetch="auto" verdict.

    Must capture the FETCH bytes, not just the compute shape:
    mel.shape[1] is always config.max_len_pad after prepare_utterance
    padding, but _convert_submit trims the fetched grid to cut_max (the
    longest frame count any (pair, condition) keeps), which varies per
    stream — so cut_max is part of the key (ADVICE r4: same-batch
    streams with very different clip lengths must not share one
    bf16/f32 verdict; the wrong mode was measured to cost ~15%
    throughput, BENCHMARKS.md "Adaptive fetch").
    """
    return (
        len(pairs),
        len(conditions),
        max(
            (t.length if "R" in c else s.length)
            for c in conditions
            for (s, t) in pairs
        ),
    )


def convert_stream(
    g_module: SpeechSplit,
    g_params,
    p_module: F0Converter,
    p_params,
    pair_batches,
    conditions: Sequence[str] = CONDITIONS,
    compress_fetch=False,
    depth: int = 2,
):
    """Pipelined batched conversion over an iterable of pair batches.

    Yields one :func:`convert_batched`-format result list per incoming
    batch, but keeps up to ``depth`` batches' device compute in flight
    while older batches' results cross the host link — on a
    fetch-bound link (this environment's tunnel moves a [56, T, 80]
    grid slower than the chip computes it, BENCHMARKS.md) the yield
    rate approaches max(compute, fetch) instead of their sum. The
    device->host copy of each grid is started at submit time
    (``copy_to_host_async``), so it proceeds during the successors'
    compute.

    ``compress_fetch`` may be the string ``"auto"``: the mode is then
    chosen ONCE, before the second batch, from measurements — the
    link profile (f32/bf16 MB/s + RTT, linkprobe.probe_link) plus a
    fenced compute timing of the first batch's actual grid — via
    ``linkprobe.choose_compress`` (bf16 only when the f32 fetch beats
    neither the bf16 fetch nor the overlapped compute). Whether bf16
    compression helps depends on link weather and on how compute-bound
    the grid is (a static flag was measured to win on two windows and
    lose 15% on a third — BENCHMARKS.md "Adaptive fetch"). An earlier
    auto design probed BOTH modes in-stream with 3-batch phases; the
    probe phases themselves cost ~15% of a 24-batch stream
    (BENCHMARKS.md round-4 A/B), so the informed one-shot decision
    replaced it — its only overhead is three duplicate dispatches of
    the first batch (a few ms of device time each: one absorbs
    compilation, two timed reps whose MIN rejects host-hiccup
    outliers; all probe dispatches suppress the early host copy so
    the compute fence is timed on a quiet link) and the
    once-per-process link probe.
    """
    import time as _time

    auto = compress_fetch == "auto"
    chosen: Optional[bool] = None if auto else bool(compress_fetch)

    in_flight: List[tuple] = []
    for pairs in pair_batches:
        if chosen is None:
            # Per-process decision cache (_auto_key: grid geometry +
            # trimmed fetch length). The probe's inputs are the link
            # profile (already cached per process by probe_link) and a
            # compute timing that is a pure function of the grid shape
            # — so re-probing a repeated stream shape can only add
            # noise and cost: the probe's 3 fenced dispatches are ~3
            # RTTs + duplicate compute, measured at 8-17% of a
            # 24-batch stream on a 37 ms-RTT window (BENCHMARKS.md
            # "Adaptive fetch" window 2).
            key = _auto_key(pairs, conditions)
            chosen = _AUTO_DECISIONS.get(key)
        if chosen is None:
            # informed one-shot decision on the first batch's shape
            from speechsplit_tpu.linkprobe import (
                choose_compress,
                probe_link,
            )

            profile = probe_link()
            # dispatch twice, with the early host copies SUPPRESSED:
            # a grid copy in flight shares the ~tens-of-MB/s link with
            # the scalar fence and inflates the measured compute to
            # ~the fetch time, flipping the decision toward f32 (the
            # measured window-2 failure, BENCHMARKS.md). The first
            # dispatch absorbs compilation; the second's scalar fence
            # times enqueue+compute (+RTT) on a quiet link.
            out0, _meta0 = _convert_submit(
                g_module, g_params, p_module, p_params, pairs,
                conditions, False, start_copy=False,
            )
            float(jnp.max(out0[:1, :1, :1]))  # absorb compile + run
            # MIN of two fenced reps: a single sample flips the
            # decision when a host hiccup (enqueue stall, GC) lands in
            # the timing window — window 2 measured exactly that (one
            # auto round at f32-level throughput on a bf16-favoring
            # link, BENCHMARKS.md "Adaptive fetch" window 2). The
            # extra duplicate dispatch is a few ms of device time
            # against a whole stream.
            compute_s = None
            out1 = out0
            for _rep in range(2):
                t0 = _time.perf_counter()
                out1, _meta1 = _convert_submit(
                    g_module, g_params, p_module, p_params, pairs,
                    conditions, False, start_copy=False,
                )
                float(jnp.max(out1[:1, :1, :1]))  # fences this compute
                rep_s = _time.perf_counter() - t0
                compute_s = rep_s if compute_s is None else min(
                    compute_s, rep_s
                )
            compute_s = max(compute_s - profile.rtt_ms * 1e-3, 1e-4)
            chosen = choose_compress(
                int(out1.size) * 4, compute_s, profile
            )
            _AUTO_DECISIONS[key] = chosen
            # now dispatch batch 1 FOR REAL in the chosen mode (a few
            # ms of duplicate device time; its copy starts normally)
            in_flight.append(
                _convert_submit(
                    g_module, g_params, p_module, p_params, pairs,
                    conditions, chosen,
                )
            )
        else:
            in_flight.append(
                _convert_submit(
                    g_module, g_params, p_module, p_params, pairs,
                    conditions, chosen,
                )
            )
        if len(in_flight) > depth:
            yield _convert_fetch(*in_flight.pop(0))
    while in_flight:
        yield _convert_fetch(*in_flight.pop(0))


def convert_long(
    config: SpeechSplitConfig,
    g_module: SpeechSplit,
    g_params,
    p_module: F0Converter,
    p_params,
    src_mel: np.ndarray,
    src_f0: np.ndarray,
    src_emb: np.ndarray,
    trg_mel: np.ndarray,
    trg_f0: np.ndarray,
    trg_emb: np.ndarray,
    condition: str = "RFU",
    overlap: int = 24,
) -> np.ndarray:
    """Convert utterances longer than the model's 192-frame geometry.

    The reference caps conversion at ``max_len_pad`` frames (~3 s);
    demo.ipynb simply pads/truncates. Here long inputs are processed in
    overlapping windows: source and target are windowed at proportional
    positions (so rhythm windows correspond), every window pair runs
    through the batched converter in ONE device call, and outputs are
    linearly cross-faded on the overlap. Window seams are smooth in mel
    space; prosody across a seam is locally (not globally) conditioned —
    an inherent property of windowed conversion, documented here rather
    than hidden.

    Returns the converted mel on the rhythm-source timeline
    ([len(trg)] if 'R' in condition else [len(src)], 80).
    """
    win = config.max_len_pad
    out_len = len(trg_mel) if "R" in condition else len(src_mel)
    drive_len = out_len
    if drive_len <= win:
        src_u = prepare_utterance(config, src_mel[:win], src_f0[:win], src_emb)
        trg_u = prepare_utterance(config, trg_mel[:win], trg_f0[:win], trg_emb)
        return convert_batched(
            g_module, g_params, p_module, p_params,
            [(src_u, trg_u)], (condition,),
        )[0][0][1]

    step = win - overlap
    n_windows = max(1, -(-(drive_len - overlap) // step))
    pairs = []
    spans = []
    for i in range(n_windows):
        start = min(i * step, drive_len - win)
        # proportional positions on each timeline
        def window(mel, f0):
            length = len(mel)
            if length <= win:
                return mel, f0, 0, length
            w_start = int(round(start / drive_len * (length - win)))
            return (
                mel[w_start : w_start + win],
                f0[w_start : w_start + win],
                w_start,
                win,
            )

        s_mel, s_f0, _, _ = window(src_mel, src_f0)
        t_mel, t_f0, _, _ = window(trg_mel, trg_f0)
        pairs.append(
            (
                prepare_utterance(config, s_mel, s_f0, src_emb),
                prepare_utterance(config, t_mel, t_f0, trg_emb),
            )
        )
        spans.append(start)

    results = convert_batched(
        g_module, g_params, p_module, p_params, pairs, (condition,)
    )

    out = np.zeros((drive_len, config.dim_freq), np.float32)
    weight = np.zeros((drive_len, 1), np.float32)
    fade = np.linspace(0.0, 1.0, overlap, dtype=np.float32)[:, None]
    for wi, (start, res) in enumerate(zip(spans, results)):
        mel = res[0][1]
        w = np.ones((len(mel), 1), np.float32)
        if overlap > 0 and wi > 0:
            w[:overlap] = fade          # fade in (has a predecessor)
        if overlap > 0 and wi < len(spans) - 1:
            w[-overlap:] = fade[::-1]   # fade out (has a successor)
        out[start : start + len(mel)] += mel * w
        weight[start : start + len(mel)] += w
    return out / np.maximum(weight, 1e-6)


def load_demo_metadata(path: str) -> list:
    """Load a demo.pkl-style validation bundle
    (entries: [spk_name, spk_emb(1,82), (mel, f0, len, uid)])."""
    import pickle

    with open(path, "rb") as handle:
        return pickle.load(handle)


def utterance_from_metadata(
    config: SpeechSplitConfig, entry: list
) -> Utterance:
    mel, f0, length, uid = entry[2]
    return prepare_utterance(
        config,
        np.asarray(mel)[:length],
        np.asarray(f0)[:length],
        np.asarray(entry[1]),
        name=entry[0],
        uid=uid,
    )
