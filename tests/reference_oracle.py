"""Import the read-only reference implementation as a test oracle.

The reference (PyTorch) lives at /root/reference and is used ONLY as a
numerical oracle in parity tests — none of its code is part of this
framework. Its utils.py imports librosa, which is not installed; a
minimal stub satisfies the import (the mel filterbank itself is tested
against our own implementation elsewhere).
"""

import sys
import types
from pathlib import Path

import pytest

REFERENCE_DIR = Path("/root/reference")


def _install_librosa_stub():
    if "librosa" in sys.modules:
        return
    librosa = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")

    def _mel_unavailable(*args, **kwargs):  # pragma: no cover
        raise RuntimeError("librosa stub: mel filterbank not available")

    filters.mel = _mel_unavailable
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters


def load_reference():
    """Return (model_module, hparams) from the reference, or skip."""
    if not REFERENCE_DIR.exists():
        pytest.skip("reference implementation not available")
    _install_librosa_stub()
    if str(REFERENCE_DIR) not in sys.path:
        sys.path.insert(0, str(REFERENCE_DIR))
    import hparams as ref_hparams  # noqa: PLC0415
    import model as ref_model  # noqa: PLC0415

    return ref_model, ref_hparams.hparams
