"""Data-plane tests: fileio, tokenizers, samplers, collate."""

import numpy as np
import pytest

from espnet_tpu.data.fileio import (
    read_2column_text, read_wav, write_2column_text, write_shape_file,
    read_shape_file, write_wav, SoundScpReader,
)
from espnet_tpu.data.sampler import build_batches, quantize_length, shard_batches
from espnet_tpu.data.tokenizer import (
    CharTokenizer, TokenIDConverter, build_token_list, BLANK, SOS_EOS, UNK,
)
from espnet_tpu.data.dataset import ASRDataset, EpochIterator, collate
from espnet_tpu.data.synth import generate_corpus


def test_two_column_roundtrip(tmp_path):
    m = {"utt1": "/a/b.wav", "utt2": "hello world with spaces"}
    write_2column_text(tmp_path / "t", m)
    assert read_2column_text(tmp_path / "t") == m


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 1600)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", x, 16000)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_shape_file(tmp_path):
    shapes = {"u1": (123, 80), "u2": (45,)}
    write_shape_file(tmp_path / "s", shapes)
    assert read_shape_file(tmp_path / "s") == shapes


def test_char_tokenizer_and_converter():
    tok = CharTokenizer()
    toks = tok.text2tokens("ab c")
    assert toks == ["a", "b", "<space>", "c"]
    assert tok.tokens2text(toks) == "ab c"
    tl = build_token_list(["ab c", "cd"], tok)
    assert tl[0] == BLANK and tl[-1] == SOS_EOS and UNK in tl
    conv = TokenIDConverter(tl)
    ids = conv.tokens2ids(toks)
    assert conv.ids2tokens(ids) == toks
    assert conv.tokens2ids(["zzz_unknown"]) == [conv.unk_id]


def test_bpe_tokenizer(tmp_path):
    pytest.importorskip("tokenizers")
    from espnet_tpu.data.tokenizer import BpeTokenizer

    sents = ["the cat sat on the mat", "the dog sat on the log"] * 20
    tok = BpeTokenizer.train(sents, 50, tmp_path / "bpe.json")
    toks = tok.text2tokens("the cat sat")
    assert tok.tokens2text(toks) == "the cat sat"


def test_build_batches_numel_bound():
    shapes = {
        "speech": {f"u{i}": 100 * (i + 1) for i in range(20)},
        "text": {f"u{i}": 5 + i % 3 for i in range(20)},
    }
    batches = build_batches(shapes, batch_bins=4000, length_quantum=64,
                            text_quantum=4)
    keys = [k for b in batches for k in b.keys]
    assert sorted(keys) == sorted(shapes["speech"])
    for b in batches:
        assert b.pad_shapes["speech"] % 64 == 0
        assert b.pad_shapes["speech"] >= max(shapes["speech"][k] for k in b.keys)
    # descending sort: first batch has the longest utterances
    assert shapes["speech"][batches[0].keys[0]] == 2000


def test_shard_batches_pads_evenly():
    shapes = {"speech": {f"u{i}": 10 for i in range(7)}}
    batches = build_batches(shapes, batch_size=2)
    sharded = shard_batches(batches, 4)
    assert len(sharded) % 4 == 0


def test_dataset_and_iterator(tmp_path):
    d, texts = generate_corpus(tmp_path / "corpus", n_utts=10)
    tok = CharTokenizer()
    tl = build_token_list(texts.values(), tok)
    conv = TokenIDConverter(tl)
    ds = ASRDataset(wav_scp=d / "wav.scp", text=d / "text",
                    tokenizer=tok, converter=conv)
    assert len(ds) == 10
    item = ds["utt0000"]
    assert item["speech"].ndim == 1 and item["text"].dtype == np.int32

    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(shapes, batch_size=4, length_quantum=256)
    it = EpochIterator(ds, batches, seed=0)
    seen = []
    for batch in it.epoch(1):
        assert batch["speech"].shape[1] % 256 == 0
        assert batch["speech"].shape[0] == len(batch["speech_lengths"])
        assert np.all(batch["text_lengths"] > 0)
        seen.extend(batch["keys"])
    assert sorted(seen) == sorted(ds.keys())
    # reproducible epoch order
    order1 = [b["keys"] for b in it.epoch(3)]
    order2 = [b["keys"] for b in it.epoch(3)]
    assert order1 == order2


def test_folded_batch_sampler():
    from espnet_tpu.data.sampler import build_batches_folded

    shapes = {
        "speech": {f"u{i}": (i + 1) * 100 for i in range(20)},
        "text": {f"u{i}": 5 for i in range(20)},
    }
    batches = build_batches_folded(
        shapes, batch_size=8, fold_lengths={"speech": 400},
    )
    covered = [k for b in batches for k in b.keys]
    assert sorted(covered) == sorted(shapes["speech"])
    # long utterances land in smaller batches
    sizes = {b.keys[0]: len(b.keys) for b in batches}
    assert len(batches[0].keys) > len(batches[-1].keys)


def test_length_batch_sampler():
    from espnet_tpu.data.sampler import build_batches_length

    shapes = {"speech": {f"u{i}": 50 + i * 10 for i in range(30)},
              "text": {f"u{i}": 4 for i in range(30)}}
    batches = build_batches_length(shapes, batch_bins=2000)
    covered = [k for b in batches for k in b.keys]
    assert sorted(covered) == sorted(shapes["speech"])
    for b in batches[:-1]:
        assert len(b.keys) >= 1


def test_unsorted_batch_sampler():
    from espnet_tpu.data.sampler import build_batches_unsorted

    shapes = {"speech": {f"u{i}": 100 for i in range(10)},
              "text": {f"u{i}": 4 for i in range(10)}}
    batches = build_batches_unsorted(shapes, batch_size=4)
    assert [b.keys for b in batches][0] == ["u0", "u1", "u2", "u3"]


def test_chunk_iterator():
    from espnet_tpu.data.dataset import ChunkIterator

    rng = np.random.RandomState(0)

    class DS:
        def __init__(self):
            self.data = {
                f"u{i}": {
                    "speech_mix": rng.randn(300 + 40 * i).astype(np.float32),
                    "speech_ref": rng.randn(300 + 40 * i, 2).astype(np.float32),
                }
                for i in range(6)
            }

        def __getitem__(self, k):
            return self.data[k]

    ds = DS()
    it = ChunkIterator(ds, list(ds.data), chunk_length=128, batch_size=4,
                       seed=1)
    batches = list(it.epoch(0))
    assert batches, "no chunk batches emitted"
    for b in batches:
        assert b["speech_mix"].shape == (4, 128)
        assert b["speech_ref"].shape == (4, 128, 2)
        assert (b["speech_mix_lengths"] == 128).all()
    # chunks are time-aligned between fields
    k0, s0 = batches[0]["keys"][0].split(":")
    ref = ds[k0]["speech_mix"][int(s0): int(s0) + 128]
    np.testing.assert_allclose(batches[0]["speech_mix"][0], ref)
    # reproducible per epoch, different across epochs
    again = list(it.epoch(0))
    np.testing.assert_allclose(batches[0]["speech_mix"], again[0]["speech_mix"])


def test_generate_hard_corpus(tmp_path):
    """Round-5 head-to-head corpus (data/synth.py generate_hard_corpus):
    confusable CV vocabulary, disjoint seeds -> disjoint utterances,
    readable audio, CTC-feasible lengths."""
    from espnet_tpu.data.fileio import read_2column_text, read_wav
    from espnet_tpu.data.synth import generate_hard_corpus, hard_vocab

    out, texts = generate_hard_corpus(tmp_path / "tr", n_utts=5, seed=0)
    out2, texts2 = generate_hard_corpus(tmp_path / "te", n_utts=5, seed=1)
    assert len(texts) == 5 and not (set(texts) & set(texts2))
    vocab = set(hard_vocab(60))
    wavs = read_2column_text(out / "wav.scp")
    for utt, text in read_2column_text(out / "text").items():
        words = text.split()
        assert 3 <= len(words) <= 7
        assert all(w in vocab for w in words)
        wav, sr = read_wav(wavs[utt])
        assert sr == 16000
        # every char + space needs >= 1 subsampled frame for CTC
        n_frames = len(wav) // 128 // 4
        assert n_frames >= 2 * sum(len(w) + 1 for w in words) // 2
