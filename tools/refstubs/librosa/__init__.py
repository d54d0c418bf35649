"""Micro-stub of librosa for running reference model code: only
filters.mel is used (espnet/nets/pytorch_backend/frontends/feature_transform.py),
delegated to espnet_tpu's mel_filterbank (slaney-style, librosa-parity)."""
from types import SimpleNamespace

import numpy as np


def _mel(*, sr=16000, n_fft=512, n_mels=80, fmin=0.0, fmax=None, htk=False,
         **kw):
    from espnet_tpu.ops.stft import mel_filterbank
    return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk)).T


filters = SimpleNamespace(mel=_mel)
