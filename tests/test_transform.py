"""v1 YAML transform pipeline (`espnet/transform/transformation.py`)."""

import numpy as np
import pytest

from espnet_tpu.data.transform import Transformation


def test_pipeline_fbank_cmvn_delta():
    t = Transformation({"process": [
        {"type": "fbank", "n_mels": 20, "n_fft": 256, "n_shift": 128},
        {"type": "utterance_cmvn", "norm_vars": True},
        {"type": "delta", "window": 2, "order": 2},
    ]})
    wav = np.sin(np.arange(4000) * 0.05).astype(np.float32)
    feats = t(wav, train=False)
    assert feats.shape[1] == 60  # 20 mels x (static + d + dd)
    # cmvn applied before delta: static block ~zero mean, unit var
    np.testing.assert_allclose(feats[:, :20].mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats[:, :20].std(0), 1.0, atol=1e-2)


def test_fbank_matches_on_device():
    """Host-side fbank parity vs ops.stft.log_mel_spectrogram."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.stft import log_mel_spectrogram

    rng = np.random.RandomState(0)
    wav = (rng.randn(4000) * 0.1).astype(np.float32)
    t = Transformation({"process": [
        {"type": "fbank", "n_mels": 23, "n_fft": 256, "n_shift": 128},
    ]})
    host = t(wav, train=False)
    dev, olens = log_mel_spectrogram(
        jnp.asarray(wav[None]), jnp.asarray([4000]), n_fft=256,
        hop_length=128, n_mels=23,
    )
    dev = np.asarray(dev[0][: int(olens[0])])
    n = min(len(host), len(dev))
    np.testing.assert_allclose(host[:n], dev[:n], rtol=1e-3, atol=1e-3)


def test_bandpass_perturbation():
    from espnet_tpu.data.transform import BandpassPerturbation

    bp = BandpassPerturbation(lower=0.3, upper=0.3, seed=0)
    x = np.ones((50, 40), np.float32)
    y = bp(x, train=True)
    dropped = (y == 0).all(axis=0)
    assert 0 < dropped.sum() < 40     # some bands dropped, not all
    assert (y[:, ~dropped] == 1).all()
    np.testing.assert_array_equal(bp(x, train=False), x)  # eval: identity
    with pytest.raises(RuntimeError):
        bp(np.ones(100, np.float32), train=True)


def test_speed_volume_noise_train_only():
    t = Transformation({"process": [
        {"type": "speed_perturbation", "lower": 1.1, "upper": 1.1},
        {"type": "volume_perturbation", "lower": 1.0, "upper": 1.0},
        {"type": "noise_injection", "lower": -20, "upper": -20},
    ]})
    wav = np.sin(np.arange(2000) * 0.02).astype(np.float32)
    out_eval = t(wav, train=False)
    np.testing.assert_array_equal(out_eval, wav)
    out_train = t(wav, train=True)
    assert out_train.shape == wav.shape  # keep_length
    assert float(np.abs(out_train - wav).max()) > 1e-4


def test_channel_selector_and_specaug():
    t = Transformation({"process": [{"type": "channel_selector",
                                     "train_channel": 1}]})
    x = np.stack([np.zeros(100), np.ones(100)], axis=1)  # (T, C)
    np.testing.assert_array_equal(t(x, train=True), np.ones(100))

    sa = Transformation({"process": [
        {"type": "spec_augment", "max_time_warp": 5, "n_freq_mask": 1,
         "max_freq_width": 5, "n_time_mask": 1, "max_time_width": 10},
    ]})
    feats = np.random.RandomState(0).randn(80, 40).astype(np.float32)
    out = sa(feats, train=True)
    assert out.shape == feats.shape


def test_yaml_file_and_unknown_type(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text("process:\n  - type: utterance_cmvn\n")
    t = Transformation(str(p))
    x = np.random.RandomState(0).randn(30, 8).astype(np.float32)
    np.testing.assert_allclose(t(x).mean(0), 0.0, atol=1e-6)
    with pytest.raises(ValueError, match="unknown transform"):
        Transformation({"process": [{"type": "nope"}]})
