"""Quantify the cross-feature-domain conversion delta (VERDICT r2 #6).

The realistic deployment mix is reference-trained weights driving
conversions on features produced by THIS repo's preprocessing (our
NCCF+Viterbi tracker instead of RAPT, device mel front-end instead of
numpy — PARITY.md #2). The golden parity tests only ever feed the
reference's own demo.pkl features, so the deviation's cost on the
conversion output was assumed, not measured. This benchmark measures
it, within what this environment permits:

No raw audio of the demo utterances exists here (demo.pkl carries
features only, and the reference's wav bundle is not in the tree), so
the audio is RESYNTHESIZED from the reference mel with the built-in
mel-consistency Griffin-Lim and re-analyzed by our front-end. The GL
round trip adds its own ~0.5-0.6 dB mel error, so every number below
is an UPPER BOUND on the true feature-domain cost; the bound is
reported alongside the GL-only floor so the reader can subtract it.

Reported (JSON):
  frontend_mel_err_db      — our re-extracted mel vs reference mel
                             (includes the GL floor)
  gl_floor_err_db          — GL resynthesis error alone (mel -> wav ->
                             reference-convention mel)
  f0_voiced_agreement      — voicing decisions, ours vs RAPT
  f0_mae_voiced            — normalized-contour MAE on commonly voiced
                             frames (the [0,1] quantize scale)
  conversion_mel_mae_<c>   — per-condition |conversion(ref feats) -
                             conversion(our feats)| mean, torch-seeded
                             reference weights (the golden-test rig)
  conversion_mel_mae_mean  — mean over the 7 conditions

Usage: python -m benchmarks.feature_domain  (TPU or CPU; ~1 min on TPU)
"""

from __future__ import annotations

import json
import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


DEMO_PKL = "/root/reference/assets/demo.pkl"


def main(argv=None) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.convert import (
        CONDITIONS,
        convert_batched,
        load_demo_metadata,
        prepare_utterance,
        utterance_from_metadata,
    )
    from speechsplit_tpu.models import F0Converter, SpeechSplit
    from speechsplit_tpu.preprocess import extract_features
    from speechsplit_tpu.utils import enable_compile_cache
    from speechsplit_tpu.vocoder import GriffinLimVocoder

    enable_compile_cache()
    config = SpeechSplitConfig()
    metadata = load_demo_metadata(DEMO_PKL)
    vocoder = GriffinLimVocoder(n_iter=60)

    # demo speakers: p226 is male, p231 female (VCTK speaker info) —
    # the same gender-dependent RAPT ranges make_spect_f0.py:40-45 uses
    ranges = {"p226": (50.0, 250.0), "p231": (100.0, 600.0)}

    result: dict = {}
    reanalyzed = []  # per speaker: (mel_ours [T,80], f0_ours [T])
    fe_errs, gl_errs, agrees, maes = [], [], [], []
    for entry in metadata:
        name = entry[0]
        mel_ref, f0_ref, length, _uid = entry[2]
        mel_ref = np.asarray(mel_ref, np.float32)[:length]
        f0_ref = np.asarray(f0_ref, np.float32)[:length]

        wav = vocoder(mel_ref)  # [ (length-1)*hop ] @16 kHz
        lo, hi = ranges.get(name, (50.0, 600.0))
        mel_ours, f0_ours = extract_features(
            jnp.asarray(wav)[None],
            jnp.asarray([len(wav)]),
            jnp.asarray([lo], jnp.float32),
            jnp.asarray([hi], jnp.float32),
            jax.random.PRNGKey(0),
        )
        t = min(length, len(wav) // config.hop_length + 1)
        mel_ours = np.asarray(mel_ours)[0, :t]
        f0_ours = np.asarray(f0_ours)[0, :t]
        reanalyzed.append((name, mel_ours, f0_ours))

        # front-end mel delta (offset-free |dB|, 0.01 == 1 dB)
        a, b = mel_ref[2 : t - 2], mel_ours[2 : t - 2]
        off = (a - b).mean()
        fe_errs.append(float(np.abs(a - b - off).mean()) * 100)

        # GL floor: resynthesized wav re-analyzed WITHOUT our tracker —
        # just the mel front-end (identical convention), so the
        # difference front-end-vs-floor isolates our mel path
        from speechsplit_tpu.ops.stft import mel_spectrogram

        mel_gl = np.asarray(mel_spectrogram(jnp.asarray(wav)[None]))[
            0, :t
        ]
        a, b = mel_ref[2 : t - 2], mel_gl[2 : t - 2]
        off = (a - b).mean()
        gl_errs.append(float(np.abs(a - b - off).mean()) * 100)

        # contour agreement vs RAPT on the same (resynthesized) audio
        v_ref = f0_ref[:t] > 1e-6  # demo contours: 0 = unvoiced
        v_ours = f0_ours > -1e9
        agrees.append(float((v_ref == v_ours).mean()))
        both = v_ref & v_ours
        if both.any():
            maes.append(
                float(np.abs(f0_ref[:t][both] - f0_ours[both]).mean())
            )
        log(
            f"{name}: frontend {fe_errs[-1]:.3f} dB (GL floor "
            f"{gl_errs[-1]:.3f}), voicing agree {agrees[-1]:.3f}"
        )

    result["frontend_mel_err_db"] = round(float(np.mean(fe_errs)), 3)
    result["gl_floor_err_db"] = round(float(np.mean(gl_errs)), 3)
    result["f0_voiced_agreement"] = round(float(np.mean(agrees)), 3)
    result["f0_mae_voiced"] = round(float(np.mean(maes)), 4)

    # ---- conversion delta under reference-converted weights ----------
    torch = None
    try:
        import torch
    except Exception:
        pass
    if torch is not None:
        from speechsplit_tpu.interop import torch_state_dict_to_params

        sys.path.insert(0, "/root/repo")
        from tests.reference_oracle import load_reference

        ref_model, ref_hparams = load_reference()
        torch.manual_seed(0)
        g_params = torch_state_dict_to_params(
            ref_model.Generator_3(ref_hparams).eval().state_dict(),
            "speechsplit",
        )
        p_params = torch_state_dict_to_params(
            ref_model.Generator_6(ref_hparams).eval().state_dict(),
            "f0_converter",
        )
        g_module = SpeechSplit(config)
        p_module = F0Converter(config)

        def pair_from(feats):
            utts = []
            for (name, mel, f0), entry in zip(feats, metadata):
                utts.append(
                    prepare_utterance(
                        config, mel, f0, np.asarray(entry[1]),
                        name=name, uid="u",
                    )
                )
            return [(utts[0], utts[1])]

        ref_utts = [
            utterance_from_metadata(config, e) for e in metadata
        ]
        out_ref = convert_batched(
            g_module, g_params, p_module, p_params,
            [(ref_utts[0], ref_utts[1])],
        )[0]
        out_ours = convert_batched(
            g_module, g_params, p_module, p_params, pair_from(reanalyzed)
        )[0]
        deltas = []
        for (n_a, m_a), (n_b, m_b) in zip(out_ref, out_ours):
            cond = n_a.split("_")[-1]
            t = min(len(m_a), len(m_b))
            d = float(np.abs(m_a[:t] - m_b[:t]).mean())
            result[f"conversion_mel_mae_{cond}"] = round(d, 4)
            deltas.append(d)
        result["conversion_mel_mae_mean"] = round(
            float(np.mean(deltas)), 4
        )
        log(f"conversion delta mean {result['conversion_mel_mae_mean']}")
    else:
        log("torch unavailable; skipping conversion-delta section")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
