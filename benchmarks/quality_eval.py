"""Disentanglement evaluation on synthetic ground truth (QUALITY.md).

The reference proves SpeechSplit's capability with pretrained
checkpoints plus the 7-condition demo (reference README.md:38-44,
demo.ipynb cell-0) and the woC/woR/woF ablation renders
(solver.py:231-269). This tool proves the same property for models
trained BY THIS FRAMEWORK, with numbers instead of listening tests, by
exploiting that the synthetic corpus (data/synthetic.py,
``--distinct_formants``) has known per-speaker ground truth:

  pitch identity   = the speaker's base F0 (gendered, 95-135/175-235 Hz)
  timbre identity  = the speaker's unique formant set
  rhythm/content   = the utterance's segment timing structure

For held-out (never trained on) utterance pairs it runs all 7 conversion
conditions plus the identity reconstruction and scores three axes:

  pitch   two sub-axes, because the stored F0 features are
          SPEAKER-NORMALIZED per utterance (reference
          make_spect_f0.py:66-67, utils.py:35-42):
          (a) intonation SHAPE — Pearson correlation between the
              output's tracked log-F0 contour (Griffin-Lim resynthesis
              -> the repo's own pitch tracker) and the condition's F0
              INPUT contour (P-converted under 'F', the source's
              otherwise). 'F' must decorrelate the output from the
              source contour and follow the converted one.
          (b) absolute REGISTER — median voiced F0 as a log2 distance
              to the target's vs the source's. The normalized features
              carry no register by construction, so register moves
              with the SPEAKER EMBEDDING ('U'), not with 'F' — the
              metric pins that this is where it lives.
  rhythm  frame-energy envelope correlation against the target's
          envelope vs the source's (time-interpolated to the output
          grid when lengths differ). 'R' must move it; absence must not.
  timbre  nearest-centroid speaker classification on voiced-frame mean
          mel spectra (centroids fitted on TRAINING features —
          separable because every synthetic speaker has unique
          formants). 'U' must re-classify the output as the target.

A calibration row scores the GL+tracker pipeline itself (ground-truth
mels through the same path), so measurement error is visible next to
the conversion scores. Scores land in a JSON dict; QUALITY.md carries
the table.

Usage (after training — see QUALITY.md for the full recipe):
  python -m benchmarks.quality_eval \
    --generator_ckpt /root/qual/run/models/1000000-G \
    --f0_ckpt /root/qual/run/models/200000-P \
    --train_mel_dir /root/qual/spmel \
    --eval_mel_dir /root/qual/spmel_eval \
    --eval_f0_dir /root/qual/raptf0_eval \
    --eval_wav_dir /root/qual/wavs_eval \
    --out /root/qual/quality.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ------------------------------------------------------------------ data


def load_tree(mel_dir: str, f0_dir: str, max_per_spk: int = 0):
    """Load (speaker -> [(uid, mel, f0)]) from feature trees."""
    out = {}
    for spk in sorted(os.listdir(mel_dir)):
        d = os.path.join(mel_dir, spk)
        if not os.path.isdir(d):
            continue
        utts = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".npy"):
                continue
            mel = np.load(os.path.join(d, f))
            f0 = np.load(os.path.join(f0_dir, spk, f))
            utts.append((f[:-4], mel.astype(np.float32), f0))
            if max_per_spk and len(utts) >= max_per_spk:
                break
        if utts:
            out[spk] = utts
    return out


def timbre_vec(mel: np.ndarray, energy_floor: float = 0.08) -> np.ndarray:
    """Pitch-invariant timbre signature of one mel spectrogram.

    Mean mel spectra conflate formants with PITCH (harmonic combs
    dominate the low bins, so a timbre-converted output with the
    source's F0 matches neither speaker's centroid). The fix is the
    classic cepstral separation: DCT along the mel axis and keep only
    the low-quefrency coefficients c1..c12 — the smooth spectral
    ENVELOPE (formant structure) — averaged over high-energy frames.
    """
    from scipy.fftpack import dct

    e = mel.mean(axis=1)
    keep = mel[e > energy_floor + e.min()]
    frames = keep if len(keep) else mel
    cep = dct(frames, type=2, norm="ortho", axis=1)[:, 1:13]
    return cep.mean(axis=0)


def speaker_centroids(tree, energy_floor: float = 0.08):
    """Per-speaker mean timbre vector (see :func:`timbre_vec`).

    Synthetic speakers have unique formant sets, so cepstral-envelope
    centroids separate them regardless of each utterance's pitch."""
    cents = {}
    for spk, utts in tree.items():
        vecs = [timbre_vec(mel, energy_floor) for _, mel, _ in utts]
        cents[spk] = np.mean(vecs, axis=0)
    return cents


def classify(mel: np.ndarray, cents: dict, energy_floor: float = 0.08):
    """Nearest-centroid speaker id (cosine) + per-speaker similarity."""
    v = timbre_vec(mel, energy_floor)
    sims = {}
    for spk, c in cents.items():
        sims[spk] = float(
            np.dot(v, c) / (np.linalg.norm(v) * np.linalg.norm(c) + 1e-9)
        )
    return max(sims, key=sims.get), sims


def envelope(mel: np.ndarray) -> np.ndarray:
    return mel.mean(axis=1)


def env_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of two energy envelopes; b is linearly
    re-timed to a's grid when lengths differ (so a source envelope can
    be compared against a target-length output)."""
    if len(b) != len(a):
        xb = np.linspace(0.0, 1.0, len(b))
        xa = np.linspace(0.0, 1.0, len(a))
        b = np.interp(xa, xb, b)
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-9
    return float((a * b).sum() / den)


# --------------------------------------------------------- pitch of mels


def tracked_logf0_of_mels(mels, vocoder, jnp, track_pitch):
    """Griffin-Lim resynthesis -> repo pitch tracker -> per-utterance
    log-F0 contour rows (unvoiced frames = -1e10), one tracker frame
    per mel frame. Wide 50-600 Hz search bounds for every utterance so
    the tracker cannot be biased toward either speaker's range."""
    wavs = vocoder.synthesize_batch([np.asarray(m) for m in mels])
    n = max(len(w) for w in wavs)
    batch = np.zeros((len(wavs), n), np.float32)
    lengths = np.zeros(len(wavs), np.int32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
        lengths[i] = len(w)
    lo = np.full(len(wavs), 50.0, np.float32)
    hi = np.full(len(wavs), 600.0, np.float32)
    logf0 = np.asarray(
        track_pitch(
            jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(lo),
            jnp.asarray(hi),
        )
    )
    return [row[: len(m)] for row, m in zip(logf0, mels)]


def median_of_rows(rows) -> np.ndarray:
    """Median voiced F0 in Hz per tracked row (NaN when fewer than 8
    voiced frames)."""
    meds = []
    for row in rows:
        voiced = row[row > -1e9]
        meds.append(
            float(np.exp(np.median(voiced))) if len(voiced) >= 8
            else float("nan")
        )
    return np.asarray(meds)


def median_f0_of_mels(mels, vocoder, jnp, track_pitch) -> np.ndarray:
    return median_of_rows(
        tracked_logf0_of_mels(mels, vocoder, jnp, track_pitch)
    )


def onehot_to_contour(onehot: np.ndarray) -> np.ndarray:
    """Quantized 257-bin one-hot F0 -> normalized contour in [0,1]
    (inverse of quantize_f0, reference utils.py:46-58: bins 1..256
    cover [0,1] uniformly; bin 0 = unvoiced -> -1e10 sentinel)."""
    ids = np.argmax(onehot, axis=-1).astype(np.float32)
    vals = (ids - 1.0) / 255.0
    return np.where(ids > 0, vals, -1e10)


def contour_corr(tracked_logf0: np.ndarray, contour: np.ndarray) -> float:
    """Pearson r between a tracked log-F0 row and a normalized F0
    contour on their common voiced frames.

    The stored/quantized contour is a per-utterance affine map of
    z-scored log-F0 (reference utils.py:35-42), and Pearson r is
    affine-invariant, so this directly measures whether the output's
    intonation SHAPE follows the contour — the axis the F condition
    controls (the speaker-normalized features carry no absolute
    register by construction). Contours of a different length are
    linearly re-timed to the tracked grid (rhythm-converted outputs).
    Returns NaN with fewer than 8 common voiced frames."""
    if len(contour) != len(tracked_logf0):
        # re-time voiced values onto the tracked grid; carry voicing
        # as a mask resampled the same way
        xc = np.linspace(0.0, 1.0, len(contour))
        xt = np.linspace(0.0, 1.0, len(tracked_logf0))
        voiced_c = (contour > -1e9).astype(np.float32)
        vals = np.where(contour > -1e9, contour, 0.0)
        contour = np.where(
            np.interp(xt, xc, voiced_c) > 0.5,
            np.interp(xt, xc, vals),
            -1e10,
        )
    mask = (tracked_logf0 > -1e9) & (contour > -1e9)
    if mask.sum() < 8:
        return float("nan")
    a = tracked_logf0[mask]
    b = contour[mask]
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-9
    return float((a * b).sum() / den)


def log2_dist(a: float, b: float) -> float:
    if not (np.isfinite(a) and np.isfinite(b)):
        return float("nan")
    return abs(float(np.log2(a) - np.log2(b)))


# ------------------------------------------------------------------ main


CONDITIONS = ("R", "F", "U", "RF", "RU", "FU", "RFU")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--generator_ckpt", required=True)
    ap.add_argument("--f0_ckpt", required=True)
    ap.add_argument("--train_mel_dir", required=True,
                    help="training mel tree (speaker one-hot ids + "
                    "timbre centroids are fitted here)")
    ap.add_argument("--eval_mel_dir", required=True)
    ap.add_argument("--eval_f0_dir", required=True)
    ap.add_argument("--eval_wav_dir", default="",
                    help="held-out wavs; when set, source/target median "
                    "F0 comes from tracking the ORIGINAL audio (else "
                    "from GL resynthesis of the ground-truth mel)")
    ap.add_argument("--pairs", type=int, default=36)
    ap.add_argument("--max_eval_per_spk", type=int, default=4)
    ap.add_argument("--centroid_utts_per_spk", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hparams", default="")
    ap.add_argument("--speakers", default="",
                    help="comma list restricting eval to these speakers "
                    "(e.g. the four UNSEEN ones for zero-shot scoring)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from speechsplit_tpu.cli.convert import _load_params
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.convert import (
        convert_batched,
        prepare_utterance,
        with_learned_embedding,
    )
    from speechsplit_tpu.data.prepare import speaker_embedding
    from speechsplit_tpu.models import F0Converter, SpeechSplit
    from speechsplit_tpu.ops.pitch import track_pitch
    from speechsplit_tpu.vocoder import GriffinLimVocoder

    config = SpeechSplitConfig()
    if args.hparams:
        config = config.parse(args.hparams)

    g_params = _load_params(args.generator_ckpt, "speechsplit", config)
    p_params = _load_params(args.f0_ckpt, "f0_converter", config)
    from speechsplit_tpu.config import resolve_dtype

    g_module = SpeechSplit(config, dtype=resolve_dtype(config.compute_dtype))
    p_module = F0Converter(config, dtype=resolve_dtype(config.compute_dtype))

    # speaker one-hot ids follow the TRAIN tree's sorted order — the
    # same assignment build_metadata made for training
    train_speakers = sorted(
        d for d in os.listdir(args.train_mel_dir)
        if os.path.isdir(os.path.join(args.train_mel_dir, d))
    )
    embs = {
        s: speaker_embedding(s, i, config.dim_spk_emb, False)
        for i, s in enumerate(train_speakers)
    }

    train_tree = load_tree(
        args.train_mel_dir,
        args.train_mel_dir.replace("spmel", "raptf0"),
        max_per_spk=args.centroid_utts_per_spk,
    )
    cents = speaker_centroids(train_tree)
    eval_tree = load_tree(
        args.eval_mel_dir, args.eval_f0_dir,
        max_per_spk=args.max_eval_per_spk,
    )
    if args.speakers:
        keep = set(args.speakers.split(","))
        eval_tree = {s: u for s, u in eval_tree.items() if s in keep}
    speakers = sorted(eval_tree)
    log(f"eval speakers: {speakers}")

    # ---------------------------------------------------------- pairs
    rng = np.random.RandomState(args.seed)
    pairs_idx = []
    while len(pairs_idx) < args.pairs:
        a, b = rng.choice(len(speakers), 2, replace=False)
        ua = rng.randint(len(eval_tree[speakers[a]]))
        ub = rng.randint(len(eval_tree[speakers[b]]))
        pairs_idx.append((speakers[a], ua, speakers[b], ub))

    def utterance(spk, i):
        uid, mel, f0 = eval_tree[spk][i]
        mel = mel[: config.max_len_pad]
        f0 = f0[: config.max_len_pad]
        u = prepare_utterance(
            config, mel, f0, embs.get(spk, embs[train_speakers[0]]),
            name=spk, uid=uid,
        )
        return with_learned_embedding(config, g_module, g_params, u)

    pairs = [
        (utterance(sa, ia), utterance(sb, ib))
        for sa, ia, sb, ib in pairs_idx
    ]

    log(f"converting {len(pairs)} pairs x {len(CONDITIONS)} conditions")
    results = convert_batched(
        g_module, g_params, p_module, p_params, pairs, CONDITIONS
    )
    recon = convert_batched(
        g_module, g_params, p_module, p_params,
        [(s, s) for s, _ in pairs], ("RFU",),
    )

    vocoder = GriffinLimVocoder(
        sample_rate=config.sample_rate, n_fft=config.fft_length,
        hop=config.hop_length, n_mels=config.dim_freq,
        fmin=config.mel_fmin, fmax=config.mel_fmax,
        ref_level_db=config.ref_level_db,
    )

    # ------------------------------------------- source/target pitch
    src_mels = [np.asarray(s.mel[0, : s.length]) for s, _ in pairs]
    trg_mels = [np.asarray(t.mel[0, : t.length]) for _, t in pairs]
    if args.eval_wav_dir:
        from scipy.io import wavfile

        def wav_f0(utts):
            wavs = []
            for u in utts:
                path = os.path.join(
                    args.eval_wav_dir, u.name, u.uid + ".wav"
                )
                fs, d = wavfile.read(path)
                wavs.append(d.astype(np.float32) / 32768.0)
            n = max(len(w) for w in wavs)
            batch = np.zeros((len(wavs), n), np.float32)
            lens = np.array([len(w) for w in wavs], np.int32)
            for i, w in enumerate(wavs):
                batch[i, : len(w)] = w
            logf0 = np.asarray(
                track_pitch(
                    jnp.asarray(batch), jnp.asarray(lens),
                    jnp.full(len(wavs), 50.0), jnp.full(len(wavs), 600.0),
                )
            )
            meds = []
            for row in logf0:
                v = row[row > -1e9]
                meds.append(
                    float(np.exp(np.median(v))) if len(v) >= 8
                    else float("nan")
                )
            return np.asarray(meds)

        src_f0 = wav_f0([s for s, _ in pairs])
        trg_f0 = wav_f0([t for _, t in pairs])
    else:
        src_f0 = median_f0_of_mels(src_mels, vocoder, jnp, track_pitch)
        trg_f0 = median_f0_of_mels(trg_mels, vocoder, jnp, track_pitch)

    # calibration: ground-truth mels through the GL+tracker pipeline
    cal_rows = tracked_logf0_of_mels(src_mels, vocoder, jnp, track_pitch)
    cal_f0 = median_of_rows(cal_rows)
    cal_err = np.nanmean(
        [log2_dist(a, b) for a, b in zip(cal_f0, src_f0)]
    )
    log(f"pipeline F0 calibration error: {cal_err:.4f} log2 units")

    # ------------------------------------------- F0-input contours
    # The F condition swaps the decoder's quantized F0 stream for the
    # P-converted contour. The stored features are SPEAKER-NORMALIZED
    # per utterance (reference make_spect_f0.py:66-67, utils.py:35-42),
    # so this stream carries intonation SHAPE only — absolute register
    # is a timbre property rendered from the speaker embedding (the U
    # axis). The right F-axis ground truth is therefore contour-shape
    # correlation, not median F0.
    from speechsplit_tpu.convert import _f0_convert_jit

    src_contours = [
        onehot_to_contour(np.asarray(s.f0_onehot[0, : s.length]))
        for s, _ in pairs
    ]
    trg_contours = [
        onehot_to_contour(np.asarray(t.f0_onehot[0, : t.length]))
        for _, t in pairs
    ]
    mel_src_b = jnp.concatenate([s.mel for s, _ in pairs], axis=0)
    f0_trg_b = jnp.concatenate([t.f0_onehot for _, t in pairs], axis=0)
    con_onehot = np.asarray(_f0_convert_jit(
        p_module, p_params, mel_src_b, f0_trg_b
    ))
    con_contours = [
        onehot_to_contour(con_onehot[i, : s.length])
        for i, (s, _) in enumerate(pairs)
    ]

    def nancorr(a_rows, b_rows):
        return float(np.nanmean(
            [contour_corr(a, b) for a, b in zip(a_rows, b_rows)]
        ))

    # the F0 converter itself, tracker-free: its output should follow
    # the TARGET's intonation shape (re-timed to source rhythm), not
    # the source's
    report_p = {
        "contour_corr_to_target": round(
            nancorr(con_contours, trg_contours), 4),
        "contour_corr_to_source": round(
            nancorr(con_contours, src_contours), 4),
    }
    # calibration: the tracked ground-truth rows must follow their own
    # stored contours through the GL+tracker pipeline
    contour_cal = nancorr(cal_rows, src_contours)
    log(f"contour calibration r={contour_cal:.3f}; "
        f"P converter: {json.dumps(report_p)}")

    # ------------------------------------------------------- scoring
    report: dict = {
        "n_pairs": len(pairs),
        "pipeline_f0_log2_err": round(float(cal_err), 4),
        "pipeline_contour_corr": round(contour_cal, 4),
        "f0_converter": report_p,
        "conditions": {},
    }

    # identity reconstruction quality
    recon_mse = [
        float(np.mean((r[0][1] - sm) ** 2))
        for r, sm in zip(recon, src_mels)
    ]
    report["recon_mel_mse"] = round(float(np.mean(recon_mse)), 6)

    # timbre of the original utterances (classifier sanity)
    src_acc = np.mean(
        [classify(m, cents)[0] == s.name for m, (s, _) in
         zip(src_mels, pairs)]
    )
    report["classifier_acc_on_ground_truth"] = round(float(src_acc), 3)

    for ci, cond in enumerate(CONDITIONS):
        outs = [results[pi][ci][1] for pi in range(len(pairs))]
        out_rows = tracked_logf0_of_mels(outs, vocoder, jnp, track_pitch)
        out_f0 = median_of_rows(out_rows)

        # intonation shape: does the output follow its F0-INPUT stream
        # (the converted contour under F, the source's otherwise)?
        input_contours = con_contours if "F" in cond else src_contours
        c_in = nancorr(out_rows, input_contours)
        c_src = nancorr(out_rows, src_contours)
        c_trg = nancorr(out_rows, trg_contours)

        d_trg = [log2_dist(o, t) for o, t in zip(out_f0, trg_f0)]
        d_src = [log2_dist(o, s) for o, s in zip(out_f0, src_f0)]
        pitch_to_target = np.nanmean(
            [1.0 if dt < ds else 0.0 for dt, ds in zip(d_trg, d_src)]
        )

        r_trg, r_src, timbre_hits_t, timbre_hits_s = [], [], 0, 0
        sim_shift = []
        for pi, ((s, t), out) in enumerate(zip(pairs, outs)):
            e_out = envelope(out)
            r_trg.append(env_corr(e_out, envelope(trg_mels[pi])))
            r_src.append(env_corr(e_out, envelope(src_mels[pi])))
            cls, sims = classify(out, cents)
            timbre_hits_t += cls == t.name
            timbre_hits_s += cls == s.name
            # softer than argmax: did the timbre MOVE toward the
            # target centroid? (matters for zero-shot, where unseen-
            # speaker conversions can land between training centroids)
            sim_shift.append(sims[t.name] - sims[s.name])

        report["conditions"][cond] = {
            "contour_corr_input": round(c_in, 4),
            "contour_corr_source": round(c_src, 4),
            "contour_corr_target": round(c_trg, 4),
            "f0_log2_dist_to_target": round(float(np.nanmean(d_trg)), 4),
            "f0_log2_dist_to_source": round(float(np.nanmean(d_src)), 4),
            "f0_moved_to_target_frac": round(float(pitch_to_target), 3),
            "env_corr_target": round(float(np.mean(r_trg)), 4),
            "env_corr_source": round(float(np.mean(r_src)), 4),
            "timbre_classified_target_frac": round(
                timbre_hits_t / len(pairs), 3
            ),
            "timbre_classified_source_frac": round(
                timbre_hits_s / len(pairs), 3
            ),
            "timbre_sim_shift_to_target": round(
                float(np.mean(sim_shift)), 4
            ),
        }
        log(f"{cond}: {json.dumps(report['conditions'][cond])}")

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
