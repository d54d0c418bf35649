"""Kaldi binary ark/scp + HDF5 feature IO
(reference `espnet/utils/io_utils.py` kaldiio/HDF5 loaders)."""

import numpy as np
import pytest


def test_kaldi_ark_roundtrip(tmp_path):
    from espnet_tpu.data.kaldi_io import (
        KaldiScpReader, read_kaldi_ark, write_kaldi_ark_scp,
    )

    rng = np.random.RandomState(0)
    mats = {f"u{i}": rng.randn(10 + i, 5).astype(np.float32) for i in range(4)}
    mats["vec"] = rng.randn(7).astype(np.float32)
    ark = tmp_path / "feats.ark"
    scp = tmp_path / "feats.scp"
    write_kaldi_ark_scp(mats, ark, scp)

    r = KaldiScpReader(scp)
    for k, v in mats.items():
        np.testing.assert_allclose(r[k], v)
    streamed = dict(read_kaldi_ark(ark))
    assert set(streamed) == set(mats)
    np.testing.assert_allclose(streamed["u2"], mats["u2"])


def test_kaldi_ark_against_kaldiio_if_available(tmp_path):
    kaldiio = pytest.importorskip("kaldiio")
    from espnet_tpu.data.kaldi_io import KaldiScpReader, write_kaldi_ark_scp

    rng = np.random.RandomState(1)
    mats = {"a": rng.randn(6, 3).astype(np.float32)}
    write_kaldi_ark_scp(mats, tmp_path / "f.ark", tmp_path / "f.scp")
    # kaldiio must be able to read what we wrote, and vice versa
    got = dict(kaldiio.load_scp(str(tmp_path / "f.scp")))
    np.testing.assert_allclose(got["a"], mats["a"], rtol=1e-6)
    kaldiio.save_ark(str(tmp_path / "k.ark"), {"b": mats["a"] * 2},
                     scp=str(tmp_path / "k.scp"))
    r = KaldiScpReader(tmp_path / "k.scp")
    np.testing.assert_allclose(r["b"], mats["a"] * 2, rtol=1e-6)


def test_h5_scp_reader(tmp_path):
    h5py = pytest.importorskip("h5py")
    from espnet_tpu.data.fileio import write_2column_text
    from espnet_tpu.data.kaldi_io import H5ScpReader, open_feats_scp

    rng = np.random.RandomState(2)
    feats = {f"u{i}": rng.randn(8, 4).astype(np.float32) for i in range(3)}
    h5 = tmp_path / "feats.h5"
    with h5py.File(h5, "w") as f:
        for k, v in feats.items():
            f[k] = v
    scp = tmp_path / "feats.scp"
    write_2column_text(scp, {k: f"{h5}:{k}" for k in feats})
    r = H5ScpReader(scp)
    for k, v in feats.items():
        np.testing.assert_allclose(r[k], v)
    assert type(open_feats_scp(scp)).__name__ == "H5ScpReader"
