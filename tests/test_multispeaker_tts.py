"""Multi-speaker / multi-lingual TTS conditioning (VERDICT r3 item 4).

Reference spec: `espnet2/tts/tacotron2/tacotron2.py:67-70,203-222,400-408,
516-523` (sids/lids embedding add; spk-embedding add/concat integration),
`espnet2/tts/fastspeech2/fastspeech2.py:67-69`,
`espnet2/gan_tts/vits/generator.py:238-247` (global conditioning g), and
the x-vector extraction role of `egs2/TEMPLATE/tts1/tts.sh:346`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config

T2 = dict(vocab_size=30, n_mels=20, embed_dim=32, encoder_conv_layers=1,
          encoder_conv_channels=32, encoder_lstm_units=32, prenet_layers=1,
          prenet_units=16, decoder_lstm_units=32, decoder_lstm_layers=1,
          att_dim=16, postnet_layers=2, postnet_channels=32,
          reduction_factor=2, max_frames=40)


def _t2_batch(b=2, u=6, t=8, n_mels=20, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    text = jax.random.randint(ks[0], (b, u), 1, 30)
    tl = jnp.asarray([u, u - 2][:b])
    mel = jax.random.normal(ks[1], (b, t, n_mels))
    ml = jnp.asarray([t, t - 2][:b])
    return text, tl, mel, ml


@pytest.mark.parametrize("integration", ["add", "concat"])
def test_tacotron2_multispeaker_forward_and_grad(integration):
    cfg = Tacotron2Config(**T2, spks=4, langs=3, spk_embed_dim=16,
                          spk_embed_integration_type=integration)
    model = Tacotron2(cfg)
    text, tl, mel, ml = _t2_batch()
    sids = jnp.asarray([0, 3])
    lids = jnp.asarray([1, 2])
    spembs = jax.random.normal(jax.random.PRNGKey(5), (2, 16))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "zoneout": jax.random.PRNGKey(2)},
        text, tl, mel, ml, True, sids, lids, spembs)
    loss, stats, _ = model.apply(params, text, tl, mel, ml, True, sids,
                                 lids, spembs, rngs={"dropout": jax.random.PRNGKey(9), "zoneout": jax.random.PRNGKey(10)})
    assert np.isfinite(float(loss))
    # conditioning params exist with the reference names
    flat = {"/".join(str(k) for k in p): v for p, v in
            jax.tree_util.tree_leaves_with_path(params)}
    names = " ".join(flat)
    assert "sid_emb" in names and "lid_emb" in names
    if integration == "add":
        assert "projection" in names

    # gradient flows into the speaker embedding table
    g = jax.grad(lambda p: model.apply(p, text, tl, mel, ml, True, sids,
                                       lids, spembs, rngs={"dropout": jax.random.PRNGKey(9), "zoneout": jax.random.PRNGKey(10)})[0])(params)
    gsum = sum(float(jnp.sum(jnp.abs(v))) for path, v in
               jax.tree_util.tree_leaves_with_path(g)
               if any("sid_emb" in str(k) for k in path))
    assert gsum > 0.0


def test_tacotron2_speaker_switch_changes_synthesis():
    cfg = Tacotron2Config(**T2, spks=4)
    model = Tacotron2(cfg)
    text, tl, mel, ml = _t2_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "zoneout": jax.random.PRNGKey(2)},
        text, tl, mel, ml, True, jnp.asarray([0, 1]), None, None)
    out_a, _, _ = model.apply(params, text[:1], tl[:1], max_frames=8,
                              sids=jnp.asarray([0]),
                              method=Tacotron2.inference, rngs={"dropout": jax.random.PRNGKey(9), "zoneout": jax.random.PRNGKey(10)})
    out_b, _, _ = model.apply(params, text[:1], tl[:1], max_frames=8,
                              sids=jnp.asarray([2]),
                              method=Tacotron2.inference, rngs={"dropout": jax.random.PRNGKey(9), "zoneout": jax.random.PRNGKey(10)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_fastspeech2_multispeaker():
    from espnet_tpu.models.tts.fastspeech2 import (
        FastSpeech2, FastSpeech2Config)

    cfg = FastSpeech2Config(
        vocab_size=30, n_mels=20, d_model=32, num_heads=2, d_ff=64,
        encoder_layers=1, decoder_layers=1, predictor_layers=1,
        predictor_channels=16, postnet_layers=1, postnet_channels=16,
        max_frames=32, spks=4, spk_embed_dim=16,
        spk_embed_integration_type="add")
    model = FastSpeech2(cfg)
    b, u, t = 2, 5, 12
    text = jax.random.randint(jax.random.PRNGKey(0), (b, u), 1, 30)
    tl = jnp.asarray([u, u - 1])
    mel = jax.random.normal(jax.random.PRNGKey(1), (b, t, 20))
    ml = jnp.asarray([t, t - 4])
    dur = jnp.asarray([[3, 3, 2, 2, 2], [2, 2, 2, 2, 0]])
    z = jnp.zeros((b, u))
    sids = jnp.asarray([1, 3])
    spembs = jax.random.normal(jax.random.PRNGKey(2), (b, 16))
    params = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        text, tl, mel, ml, dur, z, z, True, sids, None, spembs)
    loss, stats, _ = model.apply(params, text, tl, mel, ml, dur, z, z, True,
                                 sids, None, spembs,
                                 rngs={"dropout": jax.random.PRNGKey(9)})
    assert np.isfinite(float(loss))
    mel_a, _ = model.apply(params, text[:1], tl[:1], 1.0,
                           jnp.asarray([0]), None, spembs[:1],
                           method=FastSpeech2.inference,
                           rngs={"dropout": jax.random.PRNGKey(9)})
    mel_b, _ = model.apply(params, text[:1], tl[:1], 1.0,
                           jnp.asarray([2]), None, spembs[:1],
                           method=FastSpeech2.inference,
                           rngs={"dropout": jax.random.PRNGKey(9)})
    assert not np.allclose(np.asarray(mel_a), np.asarray(mel_b))


def test_vits_multispeaker():
    from espnet_tpu.models.tts.vits import VITSConfig, VITSGenerator

    cfg = VITSConfig(
        vocab_size=30, channels=16, text_heads=2, text_d_ff=32,
        text_layers=1, spec_dim=33, posterior_layers=2, flows=2,
        flow_layers=1, decoder_channels=32, upsample_scales=(4, 4),
        resblock_kernel_sizes=(3,), n_fft=64, hop_length=16,
        segment_frames=8, spks=4, langs=2, spk_embed_dim=8,
        global_channels=12)
    model = VITSGenerator(cfg)
    b, u, t = 2, 5, 16
    tokens = jax.random.randint(jax.random.PRNGKey(0), (b, u), 1, 30)
    tl = jnp.asarray([u, u - 1])
    spec = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (b, t, 33)))
    sl = jnp.asarray([t, t - 4])
    sids = jnp.asarray([0, 3])
    lids = jnp.asarray([1, 0])
    spembs = jax.random.normal(jax.random.PRNGKey(2), (b, 8))
    rngs = {"params": jax.random.PRNGKey(3),
            "posterior": jax.random.PRNGKey(4),
            "segment": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(6)}
    params = model.init(rngs, tokens, tl, spec, sl, True, sids, lids, spembs)
    out = model.apply(params, tokens, tl, spec, sl, True, sids, lids,
                      spembs, rngs={k: v for k, v in rngs.items()
                                    if k != "params"})
    assert np.isfinite(float(jnp.sum(out["wav_seg"])))
    # speaker switch changes the synthesized waveform
    wav_a, _ = model.apply(params, tokens[:1], tl[:1], 32, 0.0, 1.0,
                           jnp.asarray([0]), lids[:1], spembs[:1],
                           method=VITSGenerator.inference,
                           rngs={"posterior": jax.random.PRNGKey(7)})
    wav_b, _ = model.apply(params, tokens[:1], tl[:1], 32, 0.0, 1.0,
                           jnp.asarray([2]), lids[:1], spembs[:1],
                           method=VITSGenerator.inference,
                           rngs={"posterior": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(wav_a), np.asarray(wav_b))


def test_speaker_embedding_extractor():
    from espnet_tpu.models.tts.spk_embed import SpeakerEmbeddingExtractor

    ext = SpeakerEmbeddingExtractor(n_spk=3, embed_dim=16, channels=24)
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 20, 10))
    lens = jnp.asarray([20, 15, 10, 20])
    params = ext.init(jax.random.PRNGKey(1), feats, lens, True)
    emb, logits = ext.apply(params, feats, lens, True)
    assert emb.shape == (4, 16) and logits.shape == (4, 3)
    # padding-invariant: frames beyond the valid length don't matter
    feats2 = feats.at[1, 15:].set(99.0)
    emb2 = ext.apply(params, feats2, lens)
    np.testing.assert_allclose(np.asarray(emb[1]), np.asarray(emb2[1]),
                               rtol=1e-5, atol=1e-5)
    # trainable: one step of speaker-CE descent reduces the loss
    import optax

    def loss_fn(p):
        _, lg = ext.apply(p, feats, lens, True)
        labels = jnp.asarray([0, 1, 2, 0])
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            lg, labels))

    l0 = float(loss_fn(params))
    g = jax.grad(loss_fn)(params)
    p1 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
    assert float(loss_fn(p1)) < l0
