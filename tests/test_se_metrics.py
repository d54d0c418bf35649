"""STOI/ESTOI/SI-SNR/SDR scoring (`espnet_tpu/utils/se_metrics.py`,
reference `espnet2/bin/enh_scoring.py:1`): identity/monotonicity
invariants + the scoring CLI end-to-end with permutation assignment."""

import numpy as np
import pytest

from espnet_tpu.utils import se_metrics as M


def _speechlike(n=16000 * 2, seed=0):
    # modulated multi-tone with pauses: enough structure for the VAD and
    # octave bands to behave like speech
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    env = np.clip(np.sin(2 * np.pi * 3.0 * t), 0, None)
    x = env * (
        np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 880 * t)
        + 0.25 * np.sin(2 * np.pi * 1760 * t)
    ) + 0.01 * rng.randn(n)
    return x.astype(np.float64)


def test_stoi_identity_and_noise_monotonic():
    x = _speechlike()
    rng = np.random.RandomState(1)
    clean = M.stoi(x, x, 16000)
    assert clean > 0.95
    light = M.stoi(x, x + 0.05 * rng.randn(len(x)), 16000)
    heavy = M.stoi(x, x + 0.8 * rng.randn(len(x)), 16000)
    assert clean >= light > heavy
    assert heavy < 0.8


def test_estoi_identity_and_ordering():
    x = _speechlike(seed=2)
    rng = np.random.RandomState(3)
    assert M.estoi(x, x, 16000) > 0.95
    assert M.estoi(x, x, 16000) > M.estoi(x, x + 0.3 * rng.randn(len(x)), 16000)


def test_si_snr_scale_invariant_sdr_not():
    x = _speechlike(seed=4)
    assert M.si_snr(x, 3.0 * x) > 50
    assert M.sdr(x, 3.0 * x) < 0  # scale-variant
    noisy = x + 0.1 * np.random.RandomState(5).randn(len(x))
    assert 5 < M.si_snr(x, noisy) < 40


def test_pesq_unlocked():
    """The r3 gate is gone: se_metrics.pesq_approx returns a MOS-LQO score."""
    t = np.arange(16000) / 16000.0
    x = (np.sin(2 * np.pi * 300 * t)
         * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    assert M.pesq_approx(x, x) > 4.2
    noisy = x + 0.05 * np.random.RandomState(0).randn(len(x))
    assert 1.0 <= M.pesq_approx(x, noisy) < M.pesq_approx(x, x)


def test_enh_scoring_cli(tmp_path):
    from espnet_tpu.bin.enh_scoring import main
    from espnet_tpu.data.fileio import write_wav

    rng = np.random.RandomState(0)
    ref_scps, inf_scps = [], []
    # 2 speakers, 3 utts; inf files are the refs SWAPPED across speakers
    # plus noise -> scoring must find the permutation
    refs = {s: {} for s in range(2)}
    for s in range(2):
        lines_ref, lines_inf = [], []
        for u in range(3):
            key = f"utt{u}"
            x = _speechlike(seed=10 * s + u)
            refs[s][key] = x
        ref_scps.append(tmp_path / f"ref{s}.scp")
        inf_scps.append(tmp_path / f"inf{s}.scp")
    for s in range(2):
        lines_ref, lines_inf = [], []
        for u in range(3):
            key = f"utt{u}"
            rp = tmp_path / f"ref_{s}_{u}.wav"
            write_wav(rp, refs[s][key].astype(np.float32), 16000)
            lines_ref.append(f"{key} {rp}")
            other = refs[1 - s][key]
            ip = tmp_path / f"inf_{s}_{u}.wav"
            write_wav(ip, (other + 0.02 * rng.randn(len(other))).astype(
                np.float32), 16000)
            lines_inf.append(f"{key} {ip}")
        ref_scps[s].write_text("\n".join(lines_ref) + "\n")
        inf_scps[s].write_text("\n".join(lines_inf) + "\n")

    out = tmp_path / "score"
    main(["--output_dir", str(out),
          "--ref_scp", str(ref_scps[0]), "--ref_scp", str(ref_scps[1]),
          "--inf_scp", str(inf_scps[0]), "--inf_scp", str(inf_scps[1])])
    results = (out / "RESULTS").read_text()
    assert "STOI" in results and "SI_SNR" in results
    si = {line.split()[0]: float(line.split()[1])
          for line in (out / "SI_SNR").read_text().splitlines()}
    assert all(v > 10 for v in si.values()), si  # permutation found
    assert (out / "STOI").exists() and (out / "SDR").exists()
