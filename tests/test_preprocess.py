"""On-access preprocessor (RIR/noise/volume) + SPHERE reader.

Mirrors reference tests `test/espnet2/train/test_preprocessor.py` and the
sph2pipe role (SURVEY §2.6)."""

import numpy as np
import pytest

from espnet_tpu.data.fileio import read_sphere, read_wav, write_wav
from espnet_tpu.data.preprocess import SpeechPreprocessor, detect_non_silence


def _scp(tmp_path, name, wavs, fs=16000):
    lines = []
    for i, w in enumerate(wavs):
        p = tmp_path / f"{name}{i}.wav"
        write_wav(p, w, fs)
        lines.append(f"{name}{i} {p}")
    scp = tmp_path / f"{name}.scp"
    scp.write_text("\n".join(lines) + "\n")
    return str(scp)


def test_detect_non_silence():
    x = np.zeros(8000, np.float32)
    x[3000:5000] = np.random.RandomState(0).randn(2000) * 0.5
    mask = detect_non_silence(x)
    assert mask.shape == x.shape
    assert mask[3500:4500].all()
    assert not mask[:2000].any()


def test_noise_added_at_snr(tmp_path):
    rng = np.random.RandomState(0)
    noise = rng.randn(4000).astype(np.float32) * 0.1
    scp = _scp(tmp_path, "noise", [noise])
    speech = rng.randn(16000).astype(np.float32) * 0.3
    pre = SpeechPreprocessor(noise_scp=scp, noise_db_range="10_10", seed=1)
    out = pre(speech)
    assert out.shape == speech.shape
    diff = out - speech
    assert float(np.abs(diff).max()) > 0  # noise present
    # SNR of what was added is ~10 dB
    snr = 10 * np.log10((speech ** 2).mean() / (diff ** 2).mean())
    assert 8.0 < snr < 12.0


def test_rir_convolution_preserves_power(tmp_path):
    rng = np.random.RandomState(0)
    rir = np.zeros(800, np.float32)
    rir[0] = 1.0
    rir[400] = 0.5  # an echo
    scp = _scp(tmp_path, "rir", [rir])
    # quiet enough that the post-restore peak stays < 1 (otherwise the
    # reference's clip-protection rescale kicks in and power drops)
    speech = rng.randn(16000).astype(np.float32) * 0.1
    pre = SpeechPreprocessor(rir_scp=scp, seed=2)
    out = pre(speech)
    assert out.shape == speech.shape
    assert float(np.abs(out - speech).max()) > 1e-4  # actually convolved
    p0 = (speech[detect_non_silence(speech)] ** 2).mean()
    p1 = (out[detect_non_silence(out)] ** 2).mean()
    np.testing.assert_allclose(p1, p0, rtol=0.2)


def test_volume_normalize_and_eval_mode(tmp_path):
    rng = np.random.RandomState(0)
    noise = rng.randn(4000).astype(np.float32)
    scp = _scp(tmp_path, "noise", [noise])
    speech = rng.randn(8000).astype(np.float32) * 0.3
    # train=False: augmentation off, volume normalize still applies
    pre = SpeechPreprocessor(noise_scp=scp, speech_volume_normalize=0.5,
                             train=False, seed=3)
    out = pre(speech)
    np.testing.assert_allclose(float(np.abs(out).max()), 0.5, rtol=1e-4)
    ratio = out / speech
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-3)  # pure rescale


def test_apply_prob_zero_is_identity(tmp_path):
    rng = np.random.RandomState(0)
    scp = _scp(tmp_path, "noise", [rng.randn(4000).astype(np.float32)])
    speech = rng.randn(8000).astype(np.float32) * 0.1  # peak < 1
    pre = SpeechPreprocessor(noise_scp=scp, noise_apply_prob=0.0, seed=4)
    np.testing.assert_allclose(pre(speech), speech, atol=1e-6)


def _write_sphere(path, pcm16, rate=16000, byte_fmt="01", channels=1):
    body = pcm16.astype("<i2" if byte_fmt == "01" else ">i2").tobytes()
    header = (
        "NIST_1A\n   1024\n"
        f"channel_count -i {channels}\n"
        f"sample_count -i {pcm16.size}\n"
        f"sample_rate -i {rate}\n"
        "sample_n_bytes -i 2\n"
        f"sample_byte_format -s2 {byte_fmt}\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode().ljust(1024, b" "))
        f.write(body)


@pytest.mark.parametrize("byte_fmt", ["01", "10"])
def test_sphere_pcm_roundtrip(tmp_path, byte_fmt):
    rng = np.random.RandomState(0)
    pcm = (rng.randn(1234) * 8000).astype(np.int16)
    p = tmp_path / "x.sph"
    _write_sphere(p, pcm, byte_fmt=byte_fmt)
    wav, sr = read_sphere(p)
    assert sr == 16000
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)
    # read_wav dispatches on the magic bytes
    wav2, _ = read_wav(p)
    np.testing.assert_allclose(wav2, wav, atol=0)


def test_sphere_shorten_rejected(tmp_path):
    p = tmp_path / "s.sph"
    header = (
        "NIST_1A\n   1024\n"
        "sample_coding -s17 pcm,embedded-shorten\n"
        "end_head\n"
    )
    with open(p, "wb") as f:
        f.write(header.encode().ljust(1024, b" "))
    with pytest.raises(ValueError, match="shorten"):
        read_sphere(p)


def test_dataset_applies_preprocessor(tmp_path):
    from espnet_tpu.data.dataset import ASRDataset
    from espnet_tpu.data.tokenizer import CharTokenizer, TokenIDConverter

    rng = np.random.RandomState(0)
    wav = rng.randn(4000).astype(np.float32) * 0.3
    wav_scp = _scp(tmp_path, "utt", [wav])
    (tmp_path / "text").write_text("utt0 ab\n")
    tok = CharTokenizer()
    conv = TokenIDConverter(["<blank>", "a", "b", "<sos/eos>"])
    pre = SpeechPreprocessor(speech_volume_normalize=0.25)
    ds = ASRDataset(wav_scp=wav_scp, text=str(tmp_path / "text"),
                    tokenizer=tok, converter=conv, fs=16000,
                    preprocessor=pre)
    item = ds["utt0"]
    np.testing.assert_allclose(float(np.abs(item["speech"]).max()), 0.25,
                               rtol=1e-4)
