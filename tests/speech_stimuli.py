"""Speech-like test stimuli with synthesis-derived ground truth.

De-circularizes pitch-tracker validation (VERDICT r1 #5 / PARITY.md #2):
instead of comparing our two implementations of the same algorithm
against each other, these stimuli carry ground truth from the *synthesis*
process itself — per-period instantaneous F0 of a jittered glottal pulse
train driven through formant resonators, with shimmer, aspiration noise,
fricative (unvoiced) segments, and silence. No pitch tracker is involved
in producing the labels.

The synthesis core lives in ``speechsplit_tpu.data.synthetic`` (it also
generates training corpora for the vocoder and the data-path scale
rehearsal); this module re-exports the test-facing names.
"""

from speechsplit_tpu.data.synthetic import (  # noqa: F401
    FORMANTS,
    FS,
    HOP,
    Stimulus,
    default_utterance,
    synth_utterance,
)
