"""HuBERT masked-prediction model + k-means + task CLI."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.hubert import HubertConfig, HubertModel
from espnet_tpu.ops.kmeans import kmeans_assign, kmeans_fit


def test_kmeans_separates_clusters():
    rng = np.random.RandomState(0)
    a = rng.randn(200, 4) + 5.0
    b = rng.randn(200, 4) - 5.0
    x = np.concatenate([a, b]).astype(np.float32)
    c = kmeans_fit(x, 2, n_iter=10)
    labels = kmeans_assign(x, c)
    # the two blobs must land in different clusters
    assert len(set(labels[:200])) == 1 and len(set(labels[200:])) == 1
    assert labels[0] != labels[-1]


def test_hubert_forward_backward_and_masking():
    cfg = HubertConfig(
        num_classes=8, input_type="raw", n_fft=256, hop_length=128,
        n_mels=12, d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        dropout_rate=0.0, mask_prob=0.2, mask_length=3,
    )
    model = HubertModel(cfg)
    rng = jax.random.PRNGKey(0)
    n = 8000
    speech = jax.random.normal(rng, (2, n)) * 0.3
    lens = jnp.array([n, n // 2])
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 70), 0, 8)
    params = model.init({"params": rng, "mask": rng}, speech, lens, labels,
                        False)
    loss, stats = model.apply(params, speech, lens, labels, False,
                              rngs={"mask": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert 0.05 < float(stats["mask_ratio"]) < 0.9
    g = jax.grad(
        lambda p: model.apply(p, speech, lens, labels, False,
                              rngs={"mask": jax.random.PRNGKey(3)})[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_hubert_cli(tmp_path):
    from espnet_tpu.bin.hubert_train import main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=6, min_words=2, max_words=3)
    main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "train.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "3",
        "--data.kmeans_iters", "3",
        "--data.kmeans_sample_frames", "2000",
        "--model.num_classes", "8",
        "--model.n_fft", "256", "--model.n_mels", "12",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    exp = tmp_path / "exp"
    assert (exp / "km_centroids.npy").exists()
    assert (exp / "checkpoint.msgpack").exists()
