"""Scoring helpers of the disentanglement evaluation (QUALITY.md)."""

import numpy as np

from benchmarks.quality_eval import (
    classify,
    env_corr,
    envelope,
    load_tree,
    log2_dist,
    speaker_centroids,
)


def _mel_with_peak(t, peak_bin, rng):
    """A mel whose high-energy frames concentrate around one band —
    a stand-in for a formant-set timbre signature."""
    mel = rng.rand(t, 80).astype(np.float32) * 0.05
    band = np.exp(-0.5 * ((np.arange(80) - peak_bin) / 4.0) ** 2)
    mel[10:-10] += 0.6 * band[None, :].astype(np.float32)
    return mel


def test_centroid_classifier_separates_distinct_spectra():
    rng = np.random.RandomState(0)
    tree = {
        "pA": [(f"u{i}", _mel_with_peak(120, 15, rng), None)
               for i in range(4)],
        "pB": [(f"u{i}", _mel_with_peak(120, 55, rng), None)
               for i in range(4)],
    }
    cents = speaker_centroids(tree)
    probe_a = _mel_with_peak(90, 15, rng)
    probe_b = _mel_with_peak(90, 55, rng)
    assert classify(probe_a, cents)[0] == "pA"
    assert classify(probe_b, cents)[0] == "pB"
    # similarity scores are ordered, not just argmaxed
    _, sims = classify(probe_a, cents)
    assert sims["pA"] > sims["pB"]


def test_env_corr_retimes_and_correlates():
    t = 120
    env_t = np.sin(np.linspace(0, 3 * np.pi, t)) ** 2
    # same envelope on a different grid correlates ~1 after re-timing
    env_s = np.sin(np.linspace(0, 3 * np.pi, 77)) ** 2
    a = np.tile(env_t[:, None], (1, 80)).astype(np.float32)
    assert env_corr(envelope(a), env_s) > 0.98
    # an anti-phased envelope anti-correlates
    anti = np.cos(np.linspace(0, 3 * np.pi, t)) ** 2
    assert env_corr(env_t, anti) < -0.5


def test_log2_dist():
    assert abs(log2_dist(200.0, 100.0) - 1.0) < 1e-9
    assert log2_dist(150.0, 150.0) == 0.0
    assert np.isnan(log2_dist(float("nan"), 100.0))


def test_load_tree(tmp_path):
    mel_dir = tmp_path / "spmel" / "p300"
    f0_dir = tmp_path / "raptf0" / "p300"
    mel_dir.mkdir(parents=True)
    f0_dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(3):
        np.save(mel_dir / f"u{i}.npy", rng.rand(50, 80).astype(np.float32))
        np.save(f0_dir / f"u{i}.npy", rng.rand(50).astype(np.float32))
    tree = load_tree(str(tmp_path / "spmel"), str(tmp_path / "raptf0"))
    assert list(tree) == ["p300"]
    assert len(tree["p300"]) == 3
    uid, mel, f0 = tree["p300"][0]
    assert uid == "u0" and mel.shape == (50, 80) and f0.shape == (50,)


def test_onehot_to_contour_inverts_quantize():
    from benchmarks.quality_eval import onehot_to_contour

    import jax.numpy as jnp

    from speechsplit_tpu.ops.quantize import quantize_f0_onehot

    x = np.array([0.1, 0.25, 0.5, 0.75, 1.0, -1e10, 0.0], np.float32)
    onehot = np.asarray(quantize_f0_onehot(jnp.asarray(x), 256))
    back = onehot_to_contour(onehot)
    np.testing.assert_allclose(back[:5], x[:5], atol=1.0 / 255.0)
    # unvoiced sentinel and x<=0 (unvoiced per reference utils.py:46-58)
    assert back[5] < -1e9 and back[6] < -1e9


def test_contour_corr_is_affine_invariant_and_masked():
    from benchmarks.quality_eval import contour_corr

    t = 100
    shape = np.sin(np.linspace(0, 4 * np.pi, t)).astype(np.float32)
    tracked = 5.0 + 0.2 * shape  # log-F0-like
    contour = 0.5 + 0.1 * shape  # normalized-contour-like
    # random unvoiced holes on both sides
    rng = np.random.RandomState(0)
    tracked = np.where(rng.rand(t) < 0.2, -1e10, tracked)
    contour = np.where(rng.rand(t) < 0.2, -1e10, contour)
    assert contour_corr(tracked, contour) > 0.99
    # anti-phase contour anti-correlates
    assert contour_corr(tracked, 0.5 - 0.1 * shape) < -0.99
    # different grid: re-timed
    short = (0.5 + 0.1 * np.sin(np.linspace(0, 4 * np.pi, 63))).astype(
        np.float32
    )
    assert contour_corr(5.0 + 0.2 * shape, short) > 0.95
    # too few common voiced frames -> NaN
    assert np.isnan(contour_corr(np.full(t, -1e10), contour))
