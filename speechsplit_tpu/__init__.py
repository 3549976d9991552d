"""speechsplit_tpu — a TPU-native voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SpeechSplit
("Unsupervised Speech Decomposition via Triple Information Bottleneck",
arXiv:2004.11284; reference implementation surveyed in SURVEY.md).

Speech is disentangled into four factors — content, rhythm, pitch (F0) and
timbre — via three narrow encoder bottlenecks plus a speaker embedding,
trained with a self-reconstruction MSE loss and a random-resampling
augmentation. Any subset of the factors can be swapped at inference time.

Subpackages
-----------
- ``config``    typed configuration (replaces the reference's global HParams)
- ``ops``       DSP + augmentation kernels (STFT/mel, filters, F0, resampling)
- ``models``    the triple-bottleneck generator and the F0 converter
- ``data``      host-side feature cache, collation and device prefetch
- ``training``  jitted/pjit train loop, checkpointing, validation
- ``parallel``  device-mesh and sharding helpers
"""

from speechsplit_tpu.config import SpeechSplitConfig, default_config

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep bare import light / jax-free)
    if name == "VoiceConverter":
        from speechsplit_tpu.pipeline import VoiceConverter

        return VoiceConverter
    if name in ("SpeechSplit", "F0Converter"):
        import speechsplit_tpu.models as models

        return getattr(models, name)
    raise AttributeError(name)


__all__ = [
    "SpeechSplitConfig",
    "default_config",
    "VoiceConverter",
    "SpeechSplit",
    "F0Converter",
    "__version__",
]
