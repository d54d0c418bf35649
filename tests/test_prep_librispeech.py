"""LibriSpeech-100 readiness: prep + recipe dry-run on a fabricated
miniature corpus (r4 verdict item 2).

Fabricates the real LibriSpeech directory layout (reader/chapter tree,
`<reader>-<chapter>.trans.txt`, SPEAKERS.TXT, FLAC audio written by our
native encoder), runs `bin/prep_librispeech` (local/data.sh +
data_prep.sh analogue), and drives `recipe.py` stages 1-5 over the result
— including the BPE token-list path of the committed flagship config
(`egs/librispeech_100/conf/train_asr_conformer.yaml`), so the full LS-100
chain is one command away the day the corpus exists."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_librispeech(tmp_path_factory):
    from espnet_tpu.data.flac import write_flac

    root = tmp_path_factory.mktemp("LibriSpeech")
    rng = np.random.RandomState(0)
    texts = {
        "train-clean-100": {
            ("19", "198"): ["HELLO WORLD", "A SECOND UTTERANCE"],
            ("26", "495"): ["SPEECH RECOGNITION WORKS"],
        },
        "dev-clean": {("84", "121123"): ["DEV SET UTTERANCE"]},
        "dev-other": {("116", "288045"): ["OTHER DEV UTTERANCE"]},
        "test-clean": {("1089", "134686"): ["TEST SET UTTERANCE"]},
    }
    for part, chapters in texts.items():
        for (reader, chapter), utts in chapters.items():
            d = root / part / reader / chapter
            d.mkdir(parents=True)
            lines = []
            for i, words in enumerate(utts):
                utt = f"{reader}-{chapter}-{i:04d}"
                wav = (0.1 * rng.randn(8000)).astype(np.float32)
                write_flac(d / f"{utt}.flac", wav, 16000, mode="fixed")
                lines.append(f"{utt} {words}")
            (d / f"{reader}-{chapter}.trans.txt").write_text(
                "\n".join(lines) + "\n")
    (root / "SPEAKERS.TXT").write_text(
        ";ID |SEX| SUBSET           |MINUTES| NAME\n"
        "19  | F | train-clean-100  | 25.03 | Kara\n"
        "26  | M | train-clean-100  | 25.08 | Sean\n"
        "84  | F | dev-clean        | 8.02  | Chris\n"
        "116 | M | dev-other        | 8.02  | Pat\n"
        "1089| M | test-clean       | 8.02  | Sam\n")
    return root


def test_prep_creates_kaldi_dirs(mini_librispeech, tmp_path):
    from espnet_tpu.bin.prep_librispeech import main
    from espnet_tpu.data.fileio import read_2column_text, read_wav

    out = tmp_path / "data"
    main(["--librispeech", str(mini_librispeech),
          "--output_dir", str(out),
          "--parts", "train-clean-100", "dev-clean", "dev-other",
          "test-clean"])
    tr = out / "train_clean_100"
    wavs = read_2column_text(tr / "wav.scp")
    texts = read_2column_text(tr / "text")
    assert len(wavs) == 3 and wavs.keys() == texts.keys()
    assert texts["19-198-0000"] == "HELLO WORLD"
    u2s = read_2column_text(tr / "utt2spk")
    assert u2s["19-198-0000"] == "19-198"
    assert (tr / "spk2gender").exists()
    # native FLAC decode through the standard reader
    wav, sr = read_wav(next(iter(wavs.values())))
    assert sr == 16000 and wav.shape[0] == 8000
    # combined dev dir (data.sh stage 3)
    dev = read_2column_text(out / "dev" / "wav.scp")
    assert len(dev) == 2


def test_recipe_stages_1_to_5_bpe(mini_librispeech, tmp_path):
    """Stages 1-5 (prep passthrough -> validate -> filter -> token list)
    over the fabricated layout with the flagship config's BPE settings."""
    from espnet_tpu.bin.prep_librispeech import main as prep_main
    from espnet_tpu.bin.run import main as run_main

    data = tmp_path / "data"
    prep_main(["--librispeech", str(mini_librispeech),
               "--output_dir", str(data),
               "--parts", "train-clean-100", "dev-clean", "dev-other",
               "test-clean"])
    exp = tmp_path / "exp"
    run_main([
        "--recipe.expdir", str(exp),
        "--recipe.datadir", str(data),
        "--recipe.train_set", "train_clean_100",
        "--recipe.valid_set", "dev",
        "--recipe.test_sets", "test_clean",
        "--recipe.local_data", "",
        "--recipe.token_type", "bpe",
        "--recipe.bpe_vocab_size", "40",
        "--recipe.stop_stage", "5",
    ])
    for n in range(1, 6):
        assert (exp / f".stage{n}.done").exists(), f"stage {n} missing"
    assert (exp / "tokens" / "tokens.txt").exists()
    assert (exp / "tokens" / "bpe.json").exists()
    toks = (exp / "tokens" / "tokens.txt").read_text().splitlines()
    assert len(toks) > 10  # BPE inventory materialized


def test_flagship_config_parses(tmp_path):
    """The committed LS-100 yaml must parse into a valid RecipeConfig and
    its asr_args into the ASR task's dataclasses."""
    import shlex

    from espnet_tpu.recipe import RecipeConfig
    from espnet_tpu.utils.config import dataclass_from_dict, load_yaml

    raw = load_yaml("egs/librispeech_100/conf/train_asr_conformer.yaml")
    cfg = dataclass_from_dict(RecipeConfig, raw["recipe"])
    assert cfg.token_type == "bpe" and cfg.bpe_vocab_size == 5000
    assert cfg.speed_perturb == "0.9 1.0 1.1"
    args = shlex.split(cfg.asr_args)
    # reference tuning yaml values survive the translation
    assert "--model.num_encoder_layers" in args
    assert args[args.index("--model.d_model") + 1] == "256"
    assert args[args.index("--model.conformer_kernel_size") + 1] == "31"
    assert args[args.index("--optim.warmup_steps") + 1] == "15000"
    assert args[args.index("--run.accum_grad") + 1] == "4"

    # and the ASR task accepts them (flag-name drift guard)
    from espnet_tpu.tasks.asr import ASRTask

    parsed = ASRTask.parse_config(args + [
        "--run.output_dir", str(tmp_path),
        "--data.train_dir", str(tmp_path),
        "--data.token_list", str(tmp_path / "t.txt"),
    ])
    assert parsed["model"].d_model == 256
    assert parsed["model"].num_encoder_layers == 12
    assert parsed["optim"].warmup_steps == 15000
