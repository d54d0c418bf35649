"""Forward-parity of the flax SSL/Whisper models against HuggingFace
torch checkpoints (random-initialized tiny configs, converted through
espnet_tpu.train.hf_import) — proving any public wav2vec2/HuBERT/Whisper
checkpoint ingests losslessly.

Covers the reference integrations `espnet2/asr/encoder/wav2vec2_encoder.py`,
`hubert_encoder.py`, `whisper_encoder.py`, `asr/decoder/whisper_decoder.py`,
and `espnet2/asr/frontend/s3prl.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from espnet_tpu.models.ssl import (
    SSLConfig,
    SSLFrontend,
    Wav2Vec2ASREncoder,
    Wav2Vec2Model,
    WhisperDecoder,
    WhisperEncoder,
)
from espnet_tpu.train.hf_import import (
    ssl_config_from_hf,
    wav2vec2_params_from_torch,
    whisper_config_from_hf,
    whisper_decoder_params_from_torch,
    whisper_encoder_params_from_torch,
)


def _tiny_w2v_kwargs(**over):
    kw = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_feat_extract_layers=3,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        vocab_size=30,
    )
    kw.update(over)
    return kw


def _w2v_parity(hf_model, hf_config, atol=2e-4):
    torch.manual_seed(0)
    hf_model.eval()
    cfg = ssl_config_from_hf(hf_config)
    params = wav2vec2_params_from_torch(hf_model.state_dict(), cfg)

    rng = np.random.RandomState(0)
    b, n = 2, 2000
    wave = rng.randn(b, n).astype(np.float32) * 0.1
    lengths = np.array([n, 1600], np.int32)

    model = Wav2Vec2Model(cfg)
    states, out_lens = model.apply(
        {"params": params}, jnp.asarray(wave), jnp.asarray(lengths), True
    )

    mask = torch.zeros(b, n, dtype=torch.long)
    for i, l in enumerate(lengths):
        mask[i, :l] = 1
    with torch.no_grad():
        out = hf_model(
            torch.from_numpy(wave), attention_mask=mask,
            output_hidden_states=True,
        )
    # frame lengths must agree with HF's conv-stride formula
    hf_lens = hf_model._get_feat_extract_output_lengths(
        torch.from_numpy(lengths.astype(np.int64)))
    np.testing.assert_array_equal(np.asarray(out_lens), hf_lens.numpy())

    # every hidden state, valid frames only
    assert states.shape[0] == len(out.hidden_states)
    for li, hf_h in enumerate(out.hidden_states):
        ours = np.asarray(states[li])
        ref = hf_h.numpy()
        for i, l in enumerate(np.asarray(out_lens)):
            np.testing.assert_allclose(
                ours[i, :l], ref[i, :l], atol=atol, rtol=1e-3,
                err_msg=f"hidden state {li} utt {i}",
            )


def test_wav2vec2_base_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2Model as HFW2V

    hf_config = Wav2Vec2Config(
        **_tiny_w2v_kwargs(do_stable_layer_norm=False,
                           feat_extract_norm="group"))
    torch.manual_seed(1)
    _w2v_parity(HFW2V(hf_config), hf_config)


def test_wav2vec2_large_style_parity():
    """stable layer norm + per-layer conv LayerNorm + conv bias (lv60)."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model as HFW2V

    hf_config = Wav2Vec2Config(
        **_tiny_w2v_kwargs(do_stable_layer_norm=True,
                           feat_extract_norm="layer", conv_bias=True))
    torch.manual_seed(2)
    _w2v_parity(HFW2V(hf_config), hf_config)


def test_hubert_parity():
    from transformers import HubertConfig, HubertModel

    hf_config = HubertConfig(
        **_tiny_w2v_kwargs(do_stable_layer_norm=False,
                           feat_extract_norm="group"))
    torch.manual_seed(3)
    _w2v_parity(HubertModel(hf_config), hf_config)


def test_whisper_parity():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    hf_config = HFWhisperConfig(
        vocab_size=51865, num_mel_bins=8, d_model=16, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=32, decoder_ffn_dim=32,
        max_source_positions=24, max_target_positions=20, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(4)
    hf = WhisperForConditionalGeneration(hf_config).eval()
    sd = hf.model.state_dict()
    cfg = whisper_config_from_hf(hf_config)

    rng = np.random.RandomState(0)
    b, t_mel, u = 2, 2 * hf_config.max_source_positions, 5
    mel = rng.randn(b, t_mel, hf_config.num_mel_bins).astype(np.float32)
    tokens = rng.randint(0, 100, (b, u)).astype(np.int32)

    enc = WhisperEncoder(cfg)
    enc_params = whisper_encoder_params_from_torch(sd, cfg)
    memory, mem_lens = enc.apply(
        {"params": enc_params}, jnp.asarray(mel),
        jnp.full((b,), t_mel, jnp.int32), True,
    )
    with torch.no_grad():
        out = hf.model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
            output_hidden_states=True,
        )
    np.testing.assert_allclose(
        np.asarray(memory), out.encoder_last_hidden_state.numpy(),
        atol=2e-4, rtol=1e-3,
    )

    dec = WhisperDecoder(cfg)
    dec_params = whisper_decoder_params_from_torch(sd, cfg)
    logits = dec.apply(
        {"params": dec_params}, jnp.asarray(tokens),
        jnp.full((b,), u, jnp.int32), memory, mem_lens, True,
    )
    with torch.no_grad():
        ref_logits = hf(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=3e-4, rtol=1e-3,
    )

    # incremental score_step path must equal teacher-forced logits
    cache = dec.apply({"params": dec_params}, b, u, method=WhisperDecoder.init_cache)
    step_lp = []
    for pos in range(u):
        lp, cache = dec.apply(
            {"params": dec_params}, jnp.asarray(tokens[:, pos]), pos,
            memory, mem_lens, cache, method=WhisperDecoder.score_step,
        )
        step_lp.append(np.asarray(lp))
    full_lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1))
    np.testing.assert_allclose(
        np.stack(step_lp, 1), full_lp, atol=1e-4, rtol=1e-3)


def test_ssl_frontend_featurizer_and_freeze():
    """S3PRL-featurizer semantics: softmax layer mix; freeze=True keeps
    upstream gradients at exactly zero while layer weights still learn."""
    cfg = SSLConfig(
        hidden_size=16, num_layers=2, num_heads=2, ffn_size=32,
        conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
    )
    fe = SSLFrontend(cfg, freeze=True)
    wave = jnp.asarray(np.random.RandomState(0).randn(2, 800), jnp.float32)
    lens = jnp.asarray([800, 600], jnp.int32)
    params = fe.init(jax.random.PRNGKey(0), wave, lens, True)["params"]
    feats, olens = fe.apply({"params": params}, wave, lens, True)
    assert feats.shape[-1] == cfg.hidden_size
    assert feats.shape[0] == 2 and int(olens[0]) > 0

    def loss(p):
        f, _ = fe.apply({"params": p}, wave, lens, True)
        return jnp.sum(f ** 2)

    g = jax.grad(loss)(params)
    up_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["upstream"])
    )
    assert up_norm == 0.0, "frozen upstream must receive no gradient"
    assert float(jnp.abs(g["layer_weights"]).sum()) > 0.0


def test_wav2vec2_asr_encoder_projection():
    cfg = SSLConfig(
        hidden_size=16, num_layers=1, num_heads=2, ffn_size=32,
        conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
    )
    enc = Wav2Vec2ASREncoder(cfg, output_size=24)
    wave = jnp.asarray(np.random.RandomState(1).randn(2, 800), jnp.float32)
    lens = jnp.asarray([800, 500], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), wave, lens, True)["params"]
    out, olens = enc.apply({"params": params}, wave, lens, True)
    assert out.shape == (2, out.shape[1], 24)
    assert int(olens[1]) < int(olens[0])


TINY_SSL = dict(
    hidden_size=16, num_layers=2, num_heads=2, ffn_size=32,
    conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
)


def _asr_forward(cfg_kwargs):
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    kw = dict(vocab_size=12, d_model=16, num_heads=2, d_ff=32,
              num_encoder_layers=1, num_decoder_layers=1,
              decoder_d_ff=32, use_specaug=False,
              normalize="utterance_mvn")
    kw.update(cfg_kwargs)
    cfg = ASRConfig(**kw)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    speech = jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1)
    lens = jnp.asarray([1600, 1200], jnp.int32)
    text = jnp.asarray(rng.randint(1, 11, (2, 3)).astype(np.int32))
    tlens = jnp.asarray([3, 2], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), speech, lens, text, tlens)
    loss, stats = model.apply(variables, speech, lens, text, tlens)
    assert np.isfinite(float(loss))
    return model, variables


def test_asr_with_ssl_frontend():
    """input_type='ssl': S3PRL-featurizer frontend under a conformer."""
    from espnet_tpu.models.ssl import SSLConfig

    _asr_forward(dict(input_type="ssl", ssl=SSLConfig(**TINY_SSL),
                      encoder_type="transformer", subsampling_factor=4))


def test_asr_with_wav2vec2_encoder():
    """encoder_type='wav2vec2': SSL trunk as the encoder (dict config,
    as it arrives from YAML)."""
    _asr_forward(dict(encoder_type="wav2vec2",
                      ssl={k: list(v) if isinstance(v, tuple) else v
                           for k, v in TINY_SSL.items()},
                      ssl_freeze=False))


def test_asr_with_whisper_encoder_decoder():
    from espnet_tpu.models.ssl import WhisperConfig

    wcfg = WhisperConfig(n_mels=8, d_model=16, encoder_layers=1,
                         decoder_layers=1, num_heads=2, ffn_size=32,
                         max_source_positions=64, max_target_positions=16)
    _asr_forward(dict(encoder_type="whisper", decoder_type="whisper",
                      whisper=wcfg, normalize="none"))


def test_convert_hf_cli(tmp_path):
    """HF torch checkpoint -> convert_hf CLI -> --init_param transfer into
    an ASR model; trunk forward must match HF on the transferred weights."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model as HFW2V

    hf_config = Wav2Vec2Config(
        **_tiny_w2v_kwargs(hidden_size=16, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=32,
                           conv_dim=(8, 8), conv_kernel=(10, 3),
                           conv_stride=(5, 2), num_feat_extract_layers=2,
                           num_conv_pos_embeddings=8,
                           num_conv_pos_embedding_groups=2))
    torch.manual_seed(7)
    hf = HFW2V(hf_config).eval()
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(hf.state_dict(), ckpt)
    (tmp_path / "config.json").write_text(hf.config.to_json_string())

    from espnet_tpu.bin.convert_hf import main as convert_main

    out = tmp_path / "w2v2.msgpack"
    convert_main(["--model_type", "wav2vec2", "--checkpoint", str(tmp_path),
                  "--out", str(out)])

    model, variables = _asr_forward(
        dict(encoder_type="wav2vec2", ssl=TINY_SSL, ssl_freeze=False))
    from espnet_tpu.train.pretrained import load_pretrained

    params, n_copied, n_considered = load_pretrained(
        variables["params"], f"{out}:params:encoder/upstream")
    assert n_copied == n_considered and n_copied > 10

    # the transferred trunk reproduces HF numerics inside the ASR model
    from espnet_tpu.models.ssl import SSLConfig, Wav2Vec2Model

    wave = np.random.RandomState(3).randn(1, 1600).astype(np.float32)
    states, out_lens = Wav2Vec2Model(SSLConfig(**TINY_SSL)).apply(
        {"params": params["encoder"]["upstream"]},
        jnp.asarray(wave), jnp.asarray([1600], np.int32), True)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(states[-1]), ref,
                               atol=2e-4, rtol=1e-3)
