"""Utility CLIs: tokenize_text, split_scps, average_checkpoints, pack."""

from pathlib import Path

import numpy as np


def test_tokenize_text(tmp_path):
    from espnet_tpu.bin.tokenize_text import main

    (tmp_path / "text").write_text("utt1 ab c\nutt2 de\n")
    main(["-i", str(tmp_path / "text"), "-o", str(tmp_path / "out"),
          "-t", "char", "--field", "2-"])
    lines = (tmp_path / "out").read_text().splitlines()
    assert lines[0].split()[0] == "utt1"
    assert "<space>" in lines[0] or len(lines[0].split()) > 2


def test_split_scps(tmp_path):
    from espnet_tpu.bin.split_scps import main

    (tmp_path / "wav.scp").write_text(
        "".join(f"utt{i} /x/{i}.wav\n" for i in range(10))
    )
    main(["--scps", str(tmp_path / "wav.scp"), "--num_splits", "3",
          "--output_dir", str(tmp_path / "split")])
    total = 0
    for i in range(3):
        lines = (tmp_path / "split" / f"split.{i}" / "wav.scp").read_text().splitlines()
        total += len([l for l in lines if l.strip()])
    assert total == 10


def test_average_checkpoints(tmp_path):
    import flax.serialization as ser

    from espnet_tpu.bin.average_checkpoints import main

    for i, v in enumerate([1.0, 3.0]):
        tree = {"layer": {"w": np.full((2, 2), v, np.float32),
                          "step": np.asarray(7, np.int32)}}
        with open(tmp_path / f"p{i}.msgpack", "wb") as f:
            f.write(ser.msgpack_serialize(tree))
    main(["--inputs", str(tmp_path / "p0.msgpack"), str(tmp_path / "p1.msgpack"),
          "--output", str(tmp_path / "ave.msgpack")])
    with open(tmp_path / "ave.msgpack", "rb") as f:
        avg = ser.msgpack_restore(f.read())
    np.testing.assert_allclose(avg["layer"]["w"], 2.0)
    assert int(avg["layer"]["step"]) == 7  # ints passed through


def test_pack_unpack(tmp_path):
    from espnet_tpu.bin.pack import main

    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text("run: {}\n")
    (exp / "tokens.txt").write_text("<blank>\na\n")
    (exp / "ep1.params.msgpack").write_bytes(b"\x81")
    (exp / "stats").mkdir()
    np.savez(exp / "stats" / "feats_stats.npz", count=np.asarray(1))
    main(["--exp_dir", str(exp), "--output", str(tmp_path / "m.zip")])
    main(["--unpack", str(tmp_path / "m.zip"),
          "--output_dir", str(tmp_path / "exp2")])
    assert (tmp_path / "exp2" / "config.yaml").exists()
    assert (tmp_path / "exp2" / "tokens.txt").exists()
    assert (tmp_path / "exp2" / "stats" / "feats_stats.npz").exists()


def test_lm_calc_perplexity_cli(tmp_path):
    from espnet_tpu.bin.lm_calc_perplexity import main as ppl_main
    from espnet_tpu.bin.lm_train import main as lm_main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=10, min_words=2, max_words=3)
    lm_main([
        "--run.output_dir", str(tmp_path / "lm_exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "5",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_layers", "1",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    ppl = ppl_main([
        "--exp_dir", str(tmp_path / "lm_exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "ppl"),
        "--batch_size", "5",
    ])
    import numpy as np

    assert np.isfinite(ppl) and ppl > 1.0
    assert (tmp_path / "ppl" / "ppl").exists()


def test_aggregate_stats_dirs(tmp_path):
    import numpy as np

    from espnet_tpu.bin.aggregate_stats_dirs import main

    for i in range(2):
        d = tmp_path / f"stats.{i}"
        d.mkdir()
        np.savez(d / "feats_stats.npz", count=np.asarray(10.0 * (i + 1)),
                 sum=np.full(4, i + 1.0), sum_square=np.full(4, 2.0 * (i + 1)))
    main(["--input_dirs", str(tmp_path / "stats.0"), str(tmp_path / "stats.1"),
          "--output_dir", str(tmp_path / "merged")])
    with np.load(tmp_path / "merged" / "feats_stats.npz") as z:
        assert int(z["count"]) == 30
        np.testing.assert_allclose(z["sum"], 3.0)
        np.testing.assert_allclose(z["sum_square"], 6.0)
