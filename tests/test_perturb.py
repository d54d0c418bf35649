"""Waveform perturbation ops + speed-perturb corpus stage."""

import numpy as np

from espnet_tpu.ops.perturb import (
    noise_injection, rir_convolve, speed_perturb, speed_perturb_corpus,
    volume_perturb,
)


def test_speed_perturb_length_and_pitch():
    fs = 16000
    t = np.arange(fs) / fs
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    fast = speed_perturb(wav, 1.1)
    slow = speed_perturb(wav, 0.9)
    assert abs(len(fast) - fs / 1.1) < 2
    assert abs(len(slow) - fs / 0.9) < 2
    # energy preserved approximately
    assert abs(np.std(fast) - np.std(wav)) < 0.05
    assert np.array_equal(speed_perturb(wav, 1.0), wav)


def test_volume_and_noise():
    wav = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
    louder = volume_perturb(wav, 6.0)
    np.testing.assert_allclose(np.std(louder), np.std(wav) * 10 ** 0.3,
                               rtol=1e-3)
    noisy = noise_injection(wav, snr_db=10.0)
    noise = noisy - wav
    snr = 10 * np.log10(np.mean(wav ** 2) / np.mean(noise ** 2))
    assert abs(snr - 10.0) < 0.5


def test_rir():
    wav = np.random.RandomState(0).randn(4000).astype(np.float32)
    rir = np.zeros(100, np.float32)
    rir[0], rir[50] = 1.0, 0.5
    out = rir_convolve(wav, rir)
    assert out.shape == wav.shape
    assert np.all(np.isfinite(out))


def test_speed_perturb_corpus(tmp_path):
    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=3, min_words=2, max_words=2)
    out = speed_perturb_corpus(tmp_path / "data", tmp_path / "data_sp")
    wavs = read_2column_text(out / "wav.scp")
    texts = read_2column_text(out / "text")
    assert len(wavs) == 9  # 3 utts x 3 factors
    assert len(texts) == 9
    assert any(k.startswith("sp0.9-") for k in wavs)
