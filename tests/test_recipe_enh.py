"""Enhancement staged recipe (recipe_enh.py, the enh.sh analogue).

End-to-end smoke on the full CLI path: synthetic 2-spk mixtures -> validate
-> filter -> stats -> train (tiny TCN) -> separate -> score with the SE
metrics battery (STOI/ESTOI/SI-SNR/SDR/pesq_py). Reference:
`egs2/TEMPLATE/enh1/enh.sh` stage stack + `espnet2/bin/enh_scoring.py`.
"""

import json

import pytest


@pytest.fixture(scope="module")
def recipe_run(tmp_path_factory):
    from espnet_tpu.bin.run_enh import main

    root = tmp_path_factory.mktemp("enh_recipe")
    exp = root / "exp"
    main([
        "--recipe.expdir", str(exp),
        "--recipe.datadir", str(root / "data"),
        "--recipe.synth_utts", "8",
        "--recipe.enh_args",
        "--run.max_epoch 2 --run.log_interval 1000 --data.batch_size 4 "
        "--model.enc_channels 16 --model.enc_kernel 16 --model.enc_stride 8 "
        "--model.separator_type tcn --model.tcn_layers 2 "
        "--model.tcn_stacks 1 --model.tcn_bottleneck 8 "
        "--model.tcn_hidden 16 --model.dropout_rate 0.0 "
        "--optim.schedule constant --optim.lr 0.001",
        "--recipe.inference_args", "--batch_size 3",
    ])
    return root, exp


def test_all_stages_complete(recipe_run):
    root, exp = recipe_run
    for n in range(1, 8):
        assert (exp / f".stage{n}.done").exists(), f"stage {n} not done"


def test_artifacts(recipe_run):
    root, exp = recipe_run
    assert (exp / "enh" / "checkpoint.msgpack").exists()
    assert (exp / "stats" / "data_stats.json").exists()
    sep = exp / "enhanced_test"
    assert (sep / "spk1.scp").exists() and (sep / "spk2.scp").exists()
    results = json.loads((exp / "results.json").read_text())
    assert "test" in results
    # the full battery, incl. the clearly-named non-ITU pesq approximation
    for metric in ("STOI", "ESTOI", "SI_SNR", "SDR", "PESQ_PY"):
        assert metric in results["test"], results["test"]
        assert results["test"][metric] not in ("nan", ""), results["test"]


def test_resume_skips_done_stages(recipe_run, caplog):
    from espnet_tpu.bin.run_enh import main

    root, exp = recipe_run
    import logging

    with caplog.at_level(logging.INFO, logger="espnet_tpu"):
        main([
            "--recipe.expdir", str(exp),
            "--recipe.datadir", str(root / "data"),
        ])
    assert any("already done" in r.message for r in caplog.records)
