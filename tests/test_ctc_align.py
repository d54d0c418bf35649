"""CTC forced alignment: batched Viterbi vs per-utterance numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.ctc_align import alignment_to_segments, ctc_forced_align


def _viterbi_numpy(lp, y, blank=0):
    """Reference algorithm (`espnet/nets/pytorch_backend/ctc.py:163`)."""
    ext = []
    for tok in y:
        ext += [blank, tok]
    ext.append(blank)
    t_max = lp.shape[0]
    s_dim = len(ext)
    delta = np.full((t_max, s_dim), -1e30)
    path = np.zeros((t_max, s_dim), np.int32)
    delta[0, 0] = lp[0, ext[0]]
    if s_dim > 1:
        delta[0, 1] = lp[0, ext[1]]
    for t in range(1, t_max):
        for s in range(s_dim):
            cands = [delta[t - 1, s]]
            prev = [s]
            if s >= 1:
                cands.append(delta[t - 1, s - 1])
                prev.append(s - 1)
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                cands.append(delta[t - 1, s - 2])
                prev.append(s - 2)
            k = int(np.argmax(cands))
            delta[t, s] = cands[k] + lp[t, ext[s]]
            path[t, s] = prev[k]
    end = s_dim - 1 if delta[-1, s_dim - 1] >= delta[-1, s_dim - 2] else s_dim - 2
    states = [end]
    for t in range(t_max - 1, 0, -1):
        states.append(path[t, states[-1]])
    states = states[::-1]
    return [ext[s] for s in states]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_numpy_reference(seed):
    rng = np.random.RandomState(seed)
    b, t, v = 3, 12, 6
    logits = rng.randn(b, t, v).astype(np.float32) * 2
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    labels = np.array([[1, 2, 3], [4, 4, 0], [2, 0, 0]], np.int32)
    tlens = np.array([3, 2, 1], np.int32)
    ilens = np.array([12, 9, 5], np.int32)
    got = np.asarray(ctc_forced_align(
        lp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(tlens)
    ))
    for i in range(b):
        ref = _viterbi_numpy(np.asarray(lp[i, : ilens[i]]),
                             labels[i, : tlens[i]].tolist())
        np.testing.assert_array_equal(got[i, : ilens[i]], ref, f"utt {i}")
        # alignment must contain every label in order
        nonblank = [x for x in got[i, : ilens[i]] if x != 0]
        dedup = [x for j, x in enumerate(nonblank)
                 if j == 0 or x != nonblank[j - 1]]
        # merge repeats only within runs; labels with repeats keep both
        assert len(dedup) >= 1


def test_segments():
    frame_ids = jnp.asarray([[0, 1, 1, 0, 2, 2, 2, 0]])
    segs = alignment_to_segments(frame_ids, None, None, 0.04)
    assert segs[0] == [(1, pytest.approx(0.04), pytest.approx(0.12)),
                       (2, pytest.approx(0.16), pytest.approx(0.28))]


def test_asr_align_cli(tmp_path):
    from espnet_tpu.bin.asr_align import main as align_main
    from espnet_tpu.bin.asr_train import main as train_main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=6, min_words=2, max_words=2)
    train_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "3",
        "--model.n_mels", "20", "--model.use_specaug", "false",
        "--model.normalize", "utterance_mvn",
        "--model.encoder_type", "transformer",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--run.best_metric", "train.loss.min",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    align_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "align"),
        "--batch_size", "3",
    ])
    lines = (tmp_path / "align" / "segments").read_text().splitlines()
    assert len(lines) > 0
    parts = lines[0].split()
    assert len(parts) == 4 and float(parts[3]) >= float(parts[2])
