"""Native FLAC codec (data/flac.py) — roundtrip + format-path coverage.

The decoder must handle everything real LibriSpeech files contain
(CONSTANT/VERBATIM/FIXED/LPC subframes, Rice residuals, stereo
decorrelation); the writer emits valid VERBATIM and FIXED+Rice streams
used as the roundtrip oracle and for fabricated-corpus fixtures."""

import numpy as np
import pytest

from espnet_tpu.data.flac import flac_info, read_flac, write_flac


def _sig(n=20000, seed=0):
    rng = np.random.RandomState(seed)
    return (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
            + 0.02 * rng.randn(n)).astype(np.float32)


def _pcm(x):
    return np.clip(np.round(np.asarray(x) * 32767), -32768, 32767)


@pytest.mark.parametrize("mode", ["verbatim", "fixed"])
def test_mono_roundtrip_exact(tmp_path, mode):
    x = _sig()
    p = tmp_path / "a.flac"
    write_flac(p, x, 16000, mode=mode)
    y, sr = read_flac(p)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_array_equal(np.round(y * 32768), _pcm(x))


def test_fixed_mode_compresses(tmp_path):
    x = _sig()
    pv, pf = tmp_path / "v.flac", tmp_path / "f.flac"
    write_flac(pv, x, 16000, mode="verbatim")
    write_flac(pf, x, 16000, mode="fixed")
    assert pf.stat().st_size < pv.stat().st_size


def test_stereo_roundtrip(tmp_path):
    x = _sig()
    xs = np.stack([x, np.roll(x, 100)], axis=1)
    p = tmp_path / "s.flac"
    write_flac(p, xs, 16000)
    y, sr = read_flac(p)
    assert y.shape == xs.shape
    np.testing.assert_array_equal(np.round(y * 32768), _pcm(xs))


def test_silence_and_short(tmp_path):
    for sig in (np.zeros(5000, np.float32), _sig(37)):
        p = tmp_path / "z.flac"
        write_flac(p, sig, 16000, mode="fixed")
        y, _ = read_flac(p)
        np.testing.assert_array_equal(np.round(y * 32768), _pcm(sig))


def test_flac_info_no_decode(tmp_path):
    x = _sig(48000)
    p = tmp_path / "i.flac"
    write_flac(p, x, 16000)
    sr, ch, bps, total = flac_info(p)
    assert (sr, ch, bps, total) == (16000, 1, 16, 48000)


def test_fileio_dispatch(tmp_path):
    """read_wav / wav_duration route FLAC by magic bytes, matching the
    SPHERE dispatch pattern (r4 native-read role)."""
    from espnet_tpu.data.fileio import read_wav, wav_duration

    x = _sig(32000)
    p = tmp_path / "d.flac"
    write_flac(p, x, 16000, mode="fixed")
    y, sr = read_wav(p)
    assert sr == 16000 and len(y) == 32000
    assert abs(wav_duration(p) - 2.0) < 1e-6


def test_reject_non_flac(tmp_path):
    p = tmp_path / "x.flac"
    p.write_bytes(b"RIFFxxxx")
    with pytest.raises(ValueError):
        read_flac(p)
