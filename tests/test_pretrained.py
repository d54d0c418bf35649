"""Partial pretrained transfer (`load_pretrained_model.py` equivalent):
HuBERT-pretrained encoder layers seed an ASR encoder."""

import jax
import jax.numpy as jnp
import numpy as np


def test_hubert_to_asr_encoder_transfer(tmp_path):
    from espnet_tpu.models.asr import ASRConfig, ASRModel
    from espnet_tpu.models.hubert import HubertConfig, HubertModel
    from espnet_tpu.train.checkpoint import save_pytree
    from espnet_tpu.train.pretrained import load_pretrained

    d, h, ff, L = 16, 2, 32, 2
    hub = HubertModel(HubertConfig(
        num_classes=5, n_mels=10, d_model=d, num_heads=h, d_ff=ff,
        num_encoder_layers=L, dropout_rate=0.0,
    ))
    sp = jax.random.normal(jax.random.PRNGKey(0), (1, 4000))
    sl = jnp.array([4000])
    labels = jnp.zeros((1, 32), jnp.int32)
    import flax.linen as nn

    hub_params = nn.meta.unbox(hub.init(
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2),
         "dropout": jax.random.PRNGKey(3)},
        sp, sl, labels, False,
    )["params"])
    ckpt = tmp_path / "hubert.msgpack"
    save_pytree(ckpt, hub_params)

    asr = ASRModel(ASRConfig(
        vocab_size=8, n_mels=10, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer", d_model=d,
        num_heads=h, d_ff=ff, num_encoder_layers=L, num_decoder_layers=1,
        decoder_d_ff=ff, dropout_rate=0.0,
    ))
    text = jnp.array([[1, 2, 0]], jnp.int32)
    tl = jnp.array([2])
    asr_params = nn.meta.unbox(
        asr.init(jax.random.PRNGKey(4), sp, sl, text, tl, True)["params"]
    )
    before = np.asarray(
        asr_params["encoder"]["layer0"]["self_attn"]["q_proj"]["kernel"]
    )
    new_params, copied, _ = load_pretrained(asr_params, f"{ckpt}::encoder")
    assert copied > 0
    after = np.asarray(
        new_params["encoder"]["layer0"]["self_attn"]["q_proj"]["kernel"]
    )
    want = np.asarray(
        hub_params["layer0"]["self_attn"]["q_proj"]["kernel"]
    )
    assert not np.allclose(before, want)
    np.testing.assert_allclose(after, want)
    # the ASR model still runs with the transferred params
    loss, _ = asr.apply({"params": new_params}, sp, sl, text, tl, True)
    assert np.isfinite(float(loss))


def test_exclude_and_shape_mismatch_are_skipped(tmp_path):
    from espnet_tpu.train.checkpoint import save_pytree
    from espnet_tpu.train.pretrained import load_pretrained

    src = {"a": {"w": np.ones((2, 2), np.float32)},
           "b": {"w": np.ones((3,), np.float32)}}
    save_pytree(tmp_path / "src.msgpack", src)
    dst = {"a": {"w": np.zeros((2, 2), np.float32)},
           "b": {"w": np.zeros((4,), np.float32)}}
    out, copied, considered = load_pretrained(
        dst, f"{tmp_path / 'src.msgpack'}:::b")
    assert copied == 1  # only a/w (b excluded)
    np.testing.assert_allclose(out["a"]["w"], 1.0)
    np.testing.assert_allclose(out["b"]["w"], 0.0)
    out2, copied2, _ = load_pretrained(dst, f"{tmp_path / 'src.msgpack'}")
    assert copied2 == 1  # b skipped by shape mismatch
