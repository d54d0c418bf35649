"""Staged TTS recipe (`recipe_tts.py`, the tts.sh analogue) end to end.

Reference: `egs2/TEMPLATE/tts1/tts.sh:307-1094` — data prep, validation,
duration filter, token list, x-vector extraction (:346), train,
synthesis, and an MCD scoring stage. CPU, tiny tacotron2.
"""

from pathlib import Path

import numpy as np
import pytest

TTS_ARGS = (
    "--model.n_fft 512 --model.hop_length 128 --model.n_mels 20 "
    "--model.fmin 0 --model.fmax none "
    "--model.tacotron2.embed_dim 16 --model.tacotron2.encoder_conv_layers 1 "
    "--model.tacotron2.encoder_conv_channels 16 "
    "--model.tacotron2.encoder_lstm_units 16 "
    "--model.tacotron2.prenet_layers 1 --model.tacotron2.prenet_units 8 "
    "--model.tacotron2.decoder_lstm_units 16 "
    "--model.tacotron2.decoder_lstm_layers 1 --model.tacotron2.att_dim 8 "
    "--model.tacotron2.att_conv_channels 4 "
    "--model.tacotron2.att_conv_kernel 5 --model.tacotron2.postnet_layers 1 "
    "--model.tacotron2.postnet_channels 8 "
    "--model.tacotron2.reduction_factor 2 --model.tacotron2.max_frames 64 "
    "--optim.schedule constant --optim.lr 0.001 "
    "--run.max_epoch 1 --run.log_interval 1000 --data.batch_size 8"
)


@pytest.mark.slow
def test_recipe_tts_end_to_end(tmp_path):
    from espnet_tpu.recipe_tts import RecipeTTS, RecipeTTSConfig

    # multi-speaker synthetic corpus so the x-vector stage trains
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data" / "train", n_utts=8, min_words=1,
                    max_words=2, n_spk=2)
    generate_corpus(tmp_path / "data" / "test", n_utts=2, min_words=1,
                    max_words=2, n_spk=2, seed=5)

    cfg = RecipeTTSConfig(
        expdir=str(tmp_path / "exp"),
        datadir=str(tmp_path / "data"),
        local_data="",            # dirs pre-made above
        use_xvector=True,
        xvector_args="--epochs 3 --channels 16 --embed_dim 8",
        tts_args=TTS_ARGS,
        synth_args="--max_frames 64 --griffin_lim_iters 3 --batch_size 2",
    )
    RecipeTTS(cfg).run()

    exp = tmp_path / "exp"
    # every stage marker present
    for n in range(1, 10):
        assert (exp / f".stage{n}.done").exists(), f"stage {n} incomplete"
    # x-vector artifacts
    assert (exp / "spk_embed" / "extractor.msgpack").exists()
    embs = {}
    for line in (tmp_path / "data" / "train" / "spk_embed.scp").read_text(
            ).splitlines():
        utt, path = line.split(None, 1)
        embs[utt] = np.load(path)
    assert len(embs) == 8 and next(iter(embs.values())).shape == (8,)
    assert (tmp_path / "data" / "test" / "spk2emb.scp").exists()
    # training + synthesis + scoring artifacts
    assert (exp / "tts" / "checkpoint.msgpack").exists()
    wavs = list((exp / "synth_test" / "wav").glob("*.wav"))
    assert len(wavs) == 2
    body = (exp / "score_test" / "score_mcd.txt").read_text()
    assert "MCD mean" in body
    assert (exp / "RESULTS.md").exists()

    # resume: re-run skips everything (markers)
    RecipeTTS(cfg).run()


def test_mcd_metric_properties():
    from espnet_tpu.utils.tts_metrics import mel_cepstral_distortion

    rng = np.random.RandomState(0)
    t = np.arange(4000) / 16000.0
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    b = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    same = mel_cepstral_distortion(a, a)
    diff = mel_cepstral_distortion(a, b)
    assert same < 1e-4
    assert diff > 1.0
    # time-stretch robustness: DTW absorbs a modest tempo change
    a_slow = np.repeat(a, 2)[: int(len(a) * 1.5)]
    stretched = mel_cepstral_distortion(a, a_slow)
    assert stretched < diff


def test_fs2_without_teacher_raises_clear_error(tmp_path):
    """FastSpeech-family stage 6 demands durations BEFORE training: with
    no teacher_exp and no `durations` files it must raise a RuntimeError
    naming the fix, not the trainer's KeyError('durations') (round-5 bug:
    stage 7 ran after stage 6, so the FS2 recipe could never train)."""
    import pytest

    from espnet_tpu.recipe_tts import RecipeTTS, RecipeTTSConfig

    cfg = RecipeTTSConfig(
        expdir=str(tmp_path / "exp"), datadir=str(tmp_path / "data"),
        local_data="synth", synth_utts=2, tts_type="fastspeech2",
        stage=1, stop_stage=6,
        tts_args="--run.max_epoch 1 --data.batch_size 2",
    )
    with pytest.raises(RuntimeError, match="teacher_exp"):
        RecipeTTS(cfg).run()
