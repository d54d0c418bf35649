"""Numerical parity vs the installed torch reference (/root/reference).

Ports reference module weights into the flax modules and asserts forward
outputs match (fp32, eval mode). Discharges the BASELINE.md "allclose vs
reference forward" target for the core ASR stack:

* v1 transformer encoder (`espnet/nets/pytorch_backend/transformer/encoder.py:50`)
* v1 conformer encoder (`espnet/nets/pytorch_backend/conformer/encoder.py:38`)
* v1 transformer decoder (`espnet/nets/pytorch_backend/transformer/decoder.py:44`)

Skipped when torch or the reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:  # pragma: no cover
    sys.path.insert(0, "/root/reference")

try:
    from espnet.nets.pytorch_backend.transformer.encoder import (
        Encoder as TorchEncoder,
    )
except Exception:  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)


def t2n(t):
    return t.detach().cpu().numpy()


def dense(sd, prefix):
    out = {"kernel": t2n(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = t2n(sd[prefix + ".bias"])
    return out


def lnorm(sd, prefix):
    return {"scale": t2n(sd[prefix + ".weight"]), "bias": t2n(sd[prefix + ".bias"])}


def mha(sd, prefix):
    return {
        "q_proj": dense(sd, prefix + ".linear_q"),
        "k_proj": dense(sd, prefix + ".linear_k"),
        "v_proj": dense(sd, prefix + ".linear_v"),
        "out_proj": dense(sd, prefix + ".linear_out"),
    }


def ff(sd, prefix):
    return {"w1": dense(sd, prefix + ".w_1"), "w2": dense(sd, prefix + ".w_2")}


def conv2d_subsampling(sd, prefix, c, f2):
    """Port reference Conv2dSubsampling: two torch convs + flattening linear.

    torch flattens (C, F) channel-major; the flax module flattens (F, C)
    freq-major, so the linear's input rows are permuted accordingly.
    """
    w_out = t2n(sd[prefix + ".out.0.weight"])  # (D, C*F2)
    d = w_out.shape[0]
    kernel = w_out.reshape(d, c, f2).transpose(2, 1, 0).reshape(f2 * c, d)
    return {
        "conv0": {
            "kernel": t2n(sd[prefix + ".conv.0.weight"]).transpose(2, 3, 1, 0),
            "bias": t2n(sd[prefix + ".conv.0.bias"]),
        },
        "conv1": {
            "kernel": t2n(sd[prefix + ".conv.2.weight"]).transpose(2, 3, 1, 0),
            "bias": t2n(sd[prefix + ".conv.2.bias"]),
        },
        "out": {"kernel": kernel, "bias": t2n(sd[prefix + ".out.0.bias"])},
    }


def _feats(b=2, t=57, f=80, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, t, f).astype(np.float32)


def test_transformer_encoder_parity():
    from espnet_tpu.models.transformer import TransformerEncoder

    d, h, dff, nl = 64, 2, 128, 2
    tenc = TorchEncoder(
        idim=80, attention_dim=d, attention_heads=h, linear_units=dff,
        num_blocks=nl, input_layer="conv2d", dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
    ).eval()
    sd = tenc.state_dict()
    x = _feats()
    with torch.no_grad():
        ref, _ = tenc(torch.from_numpy(x), torch.ones(2, 1, 57, dtype=torch.bool))
    ref = t2n(ref)

    f2 = (((80 - 1) // 2) - 1) // 2  # freq dim after two stride-2 convs
    params = {
        "embed": conv2d_subsampling(sd, "embed", d, f2),
        "final_norm": lnorm(sd, "after_norm"),
    }
    for i in range(nl):
        params[f"layer{i}"] = {
            "norm1": lnorm(sd, f"encoders.{i}.norm1"),
            "self_attn": mha(sd, f"encoders.{i}.self_attn"),
            "norm2": lnorm(sd, f"encoders.{i}.norm2"),
            "ff": ff(sd, f"encoders.{i}.feed_forward"),
        }
    enc = TransformerEncoder(d_model=d, num_heads=h, d_ff=dff, num_layers=nl,
                             dropout_rate=0.0)
    out, olens = enc.apply(
        {"params": params}, jnp.asarray(x), jnp.full((2,), 57, jnp.int32), True
    )
    assert int(olens[0]) == ref.shape[1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_conformer_encoder_parity():
    from espnet.nets.pytorch_backend.conformer.encoder import (
        Encoder as TorchConformer,
    )
    from espnet_tpu.models.conformer import ConformerEncoder

    d, h, dff, nl, ksize = 64, 2, 128, 2, 7
    tenc = TorchConformer(
        idim=80, attention_dim=d, attention_heads=h, linear_units=dff,
        num_blocks=nl, input_layer="conv2d", dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=ksize,
    ).eval()
    sd = tenc.state_dict()
    x = _feats()
    with torch.no_grad():
        ref, _ = tenc(torch.from_numpy(x), torch.ones(2, 1, 57, dtype=torch.bool))
    ref = t2n(ref)

    f2 = (((80 - 1) // 2) - 1) // 2
    params = {"embed": conv2d_subsampling(sd, "embed", d, f2)}
    batch_stats = {}
    for i in range(nl):
        pfx = f"encoders.{i}"
        attn = mha(sd, pfx + ".self_attn")
        attn["pos_proj"] = {"kernel": t2n(sd[pfx + ".self_attn.linear_pos.weight"]).T}
        dk = d // h
        attn["pos_bias_u"] = t2n(sd[pfx + ".self_attn.pos_bias_u"]).reshape(h, dk)
        attn["pos_bias_v"] = t2n(sd[pfx + ".self_attn.pos_bias_v"]).reshape(h, dk)
        # torch Conv1d weights: pointwise (C_out, C_in, 1) -> Dense;
        # depthwise (D, 1, k) -> flax (k, 1, D)
        conv = {
            "pointwise_conv1": {
                "kernel": t2n(sd[pfx + ".conv_module.pointwise_conv1.weight"])[:, :, 0].T,
                "bias": t2n(sd[pfx + ".conv_module.pointwise_conv1.bias"]),
            },
            "depthwise_conv": {
                "kernel": t2n(sd[pfx + ".conv_module.depthwise_conv.weight"]).transpose(2, 1, 0),
                "bias": t2n(sd[pfx + ".conv_module.depthwise_conv.bias"]),
            },
            "norm": {
                "scale": t2n(sd[pfx + ".conv_module.norm.weight"]),
                "bias": t2n(sd[pfx + ".conv_module.norm.bias"]),
            },
            "pointwise_conv2": {
                "kernel": t2n(sd[pfx + ".conv_module.pointwise_conv2.weight"])[:, :, 0].T,
                "bias": t2n(sd[pfx + ".conv_module.pointwise_conv2.bias"]),
            },
        }
        batch_stats[f"layer{i}"] = {
            "conv": {
                "norm": {
                    "mean": t2n(sd[pfx + ".conv_module.norm.running_mean"]),
                    "var": t2n(sd[pfx + ".conv_module.norm.running_var"]),
                }
            }
        }
        params[f"layer{i}"] = {
            "norm_ff1": lnorm(sd, pfx + ".norm_ff_macaron"),
            "ff1": ff(sd, pfx + ".feed_forward_macaron"),
            "norm_attn": lnorm(sd, pfx + ".norm_mha"),
            "self_attn": attn,
            "norm_conv": lnorm(sd, pfx + ".norm_conv"),
            "conv": conv,
            "norm_ff2": lnorm(sd, pfx + ".norm_ff"),
            "ff2": ff(sd, pfx + ".feed_forward"),
            "norm_final": lnorm(sd, pfx + ".norm_final"),
        }
    enc = ConformerEncoder(
        d_model=d, num_heads=h, d_ff=dff, num_layers=nl, kernel_size=ksize,
        dropout_rate=0.0, conv_norm_type="batch",
    )
    out, olens = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), jnp.full((2,), 57, jnp.int32), True,
    )
    assert int(olens[0]) == ref.shape[1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_transformer_decoder_parity():
    from espnet.nets.pytorch_backend.transformer.decoder import (
        Decoder as TorchDecoder,
    )
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask
    from espnet_tpu.models.transformer import TransformerDecoder

    vocab, d, h, dff, nl = 30, 64, 2, 128, 2
    tdec = TorchDecoder(
        odim=vocab, attention_dim=d, attention_heads=h, linear_units=dff,
        num_blocks=nl, dropout_rate=0.0, positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
    ).eval()
    sd = tdec.state_dict()
    rng = np.random.RandomState(1)
    b, u, tm = 2, 9, 13
    ys = rng.randint(0, vocab, (b, u)).astype(np.int64)
    mem = rng.randn(b, tm, d).astype(np.float32)
    with torch.no_grad():
        tgt_mask = subsequent_mask(u).unsqueeze(0)
        ref, _ = tdec(
            torch.from_numpy(ys), tgt_mask,
            torch.from_numpy(mem), torch.ones(b, 1, tm, dtype=torch.bool),
        )
    ref = t2n(ref)

    params = {
        "embed": {"embedding": t2n(sd["embed.0.weight"])},
        "final_norm": lnorm(sd, "after_norm"),
        "out_proj": dense(sd, "output_layer"),
    }
    for i in range(nl):
        params[f"layer{i}"] = {
            "norm1": lnorm(sd, f"decoders.{i}.norm1"),
            "self_attn": mha(sd, f"decoders.{i}.self_attn"),
            "norm2": lnorm(sd, f"decoders.{i}.norm2"),
            "src_attn": mha(sd, f"decoders.{i}.src_attn"),
            "norm3": lnorm(sd, f"decoders.{i}.norm3"),
            "ff": ff(sd, f"decoders.{i}.feed_forward"),
        }
    dec = TransformerDecoder(vocab_size=vocab, d_model=d, num_heads=h,
                             d_ff=dff, num_layers=nl, dropout_rate=0.0)
    logits = dec.apply(
        {"params": params},
        jnp.asarray(ys.astype(np.int32)), jnp.full((b,), u, jnp.int32),
        jnp.asarray(mem), jnp.full((b,), tm, jnp.int32), True,
    )
    # reference returns post-norm hidden -> output_layer log-softmax? No:
    # Decoder.forward returns (x, tgt_mask) after output_layer (raw logits).
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-4)


def test_hifigan_generator_parity():
    from espnet2.gan_tts.hifigan.hifigan import HiFiGANGenerator as TorchG
    from espnet_tpu.models.tts.hifigan import HiFiGANGenerator

    torch.manual_seed(0)
    scales, ksizes, rk, rd = [4, 4], [8, 8], [3], [[1, 3]]
    tg = TorchG(in_channels=10, out_channels=1, channels=32,
                upsample_scales=scales, upsample_kernel_sizes=ksizes,
                resblock_kernel_sizes=rk, resblock_dilations=rd).eval()
    tg.remove_weight_norm()
    sd = tg.state_dict()

    def conv1d(prefix):
        return {"kernel": t2n(sd[prefix + ".weight"]).transpose(2, 1, 0),
                "bias": t2n(sd[prefix + ".bias"])}

    def convtr(prefix):
        w = t2n(sd[prefix + ".weight"]).transpose(2, 0, 1)  # (k, Cin, Cout)
        return {"kernel": np.ascontiguousarray(w[::-1]),
                "bias": t2n(sd[prefix + ".bias"])}

    params = {"input_conv": conv1d("input_conv"),
              "output_conv": conv1d("output_conv.1")}
    for i in range(len(scales)):
        params[f"upsample{i}"] = convtr(f"upsamples.{i}.1")
        for j in range(len(rk)):
            blk = {}
            for di in range(len(rd[j])):
                blk[f"conv{di}_1"] = conv1d(
                    f"blocks.{i * len(rk) + j}.convs1.{di}.1")
                blk[f"conv{di}_2"] = conv1d(
                    f"blocks.{i * len(rk) + j}.convs2.{di}.1")
            params[f"block{i}_{j}"] = blk

    g = HiFiGANGenerator(in_channels=10, channels=32, upsample_scales=scales,
                         resblock_kernel_sizes=rk,
                         resblock_dilations=[tuple(d) for d in rd])
    mel = np.random.RandomState(2).randn(2, 19, 10).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel.transpose(0, 2, 1)))  # (B, 1, T*16)
    out = g.apply({"params": params}, jnp.asarray(mel))  # (B, T*16, 1)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 0], t2n(ref)[:, 0, :], rtol=1e-4, atol=1e-4
    )


def conv1d(sd, prefix):
    """torch Conv1d (out, in, k) -> flax Conv kernel (k, in, out)."""
    out = {"kernel": t2n(sd[prefix + ".weight"]).transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = t2n(sd[prefix + ".bias"])
    return out


def conv1d_as_dense(sd, prefix):
    """kernel-1 positionwise Conv1d == Dense: (out, in, 1) -> (in, out)."""
    out = {"kernel": t2n(sd[prefix + ".weight"])[:, :, 0].T}
    if prefix + ".bias" in sd:
        out["bias"] = t2n(sd[prefix + ".bias"])
    return out


def _fft_stack(sd, prefix, n_layers):
    """espnet2 FS2 encoder/decoder (transformer Encoder w/ conv1d-k1
    positionwise + ScaledPositionalEncoding) -> our _FFTBlockStack params."""
    params = {
        "pos_alpha": t2n(sd[prefix + ".embed." +
                            ("1" if prefix + ".embed.1.alpha" in sd else "0")
                            + ".alpha"]).reshape(1),
        "final_norm": lnorm(sd, prefix + ".after_norm"),
    }
    for i in range(n_layers):
        p = f"{prefix}.encoders.{i}"
        params[f"layer{i}"] = {
            "norm1": lnorm(sd, p + ".norm1"),
            "self_attn": mha(sd, p + ".self_attn"),
            "norm2": lnorm(sd, p + ".norm2"),
            "ff": {"w1": conv1d_as_dense(sd, p + ".feed_forward.w_1"),
                   "w2": conv1d_as_dense(sd, p + ".feed_forward.w_2")},
        }
    return params


def _var_predictor(sd, prefix, n_layers, final="linear"):
    params = {}
    for i in range(n_layers):
        params[f"conv{i}"] = conv1d(sd, f"{prefix}.conv.{i}.0")
        params[f"norm{i}"] = lnorm(sd, f"{prefix}.conv.{i}.2")
    params["out"] = dense(sd, f"{prefix}.{final}")
    return params


def test_fastspeech2_parity():
    """FS2 teacher-forced forward vs `espnet2/tts/fastspeech2/fastspeech2.py:33`
    (encoder, variance adaptor, length regulator, decoder, BatchNorm postnet)."""
    from espnet2.tts.fastspeech2.fastspeech2 import FastSpeech2 as TorchFS2
    from espnet_tpu.models.tts.fastspeech2 import FastSpeech2, FastSpeech2Config

    idim, odim, adim = 20, 10, 32
    tfs = TorchFS2(
        idim=idim, odim=odim, adim=adim, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=3, postnet_chans=24,
        postnet_filts=5, reduction_factor=1,
        duration_predictor_layers=2, duration_predictor_chans=16,
        duration_predictor_kernel_size=3,
        pitch_predictor_layers=2, pitch_predictor_chans=16,
        pitch_predictor_kernel_size=3, pitch_embed_kernel_size=9,
        energy_predictor_layers=2, energy_predictor_chans=16,
        energy_predictor_kernel_size=3, energy_embed_kernel_size=9,
        transformer_enc_dropout_rate=0.0, transformer_dec_dropout_rate=0.0,
    ).eval()
    sd = tfs.state_dict()

    rng = np.random.RandomState(0)
    b = 2
    # the reference `forward` pads text with <eos> internally and expects
    # durations/pitch/energy already sized text_len+1; drive `_forward`
    # with the eos-padded sequence on both sides
    u = 7
    text = rng.randint(1, idim - 1, (b, u)).astype(np.int64)
    text[:, -1] = idim - 1  # eos
    durations = rng.randint(1, 4, (b, u)).astype(np.int64)
    # equal totals so both rows are unpadded
    durations[:, -1] += durations.sum(1).max() - durations.sum(1)
    t = int(durations.sum(1)[0])
    mel = rng.randn(b, t, odim).astype(np.float32)
    pitch = rng.randn(b, u, 1).astype(np.float32)
    energy = rng.randn(b, u, 1).astype(np.float32)

    with torch.no_grad():
        before, after, d_out, p_out, e_out = tfs._forward(
            torch.from_numpy(text), torch.full((b,), u, dtype=torch.long),
            torch.from_numpy(mel), torch.full((b,), t, dtype=torch.long),
            ds=torch.from_numpy(durations), ps=torch.from_numpy(pitch),
            es=torch.from_numpy(energy),
        )

    params = {
        "embed": {"embedding": t2n(sd["encoder.embed.0.weight"])},
        "encoder": _fft_stack(sd, "encoder", 2),
        "decoder": _fft_stack(sd, "decoder", 2),
        "duration": _var_predictor(sd, "duration_predictor", 2),
        "pitch": _var_predictor(sd, "pitch_predictor", 2),
        "energy": _var_predictor(sd, "energy_predictor", 2),
        "pitch_embed": conv1d(sd, "pitch_embed.0"),
        "energy_embed": conv1d(sd, "energy_embed.0"),
        "mel_out": dense(sd, "feat_out"),
        "postnet": {},
    }
    batch_stats = {"postnet": {}}
    for i in range(3):
        params["postnet"][f"conv{i}"] = conv1d(sd, f"postnet.postnet.{i}.0")
        params["postnet"][f"norm{i}"] = {
            "scale": t2n(sd[f"postnet.postnet.{i}.1.weight"]),
            "bias": t2n(sd[f"postnet.postnet.{i}.1.bias"]),
        }
        batch_stats["postnet"][f"norm{i}"] = {
            "mean": t2n(sd[f"postnet.postnet.{i}.1.running_mean"]),
            "var": t2n(sd[f"postnet.postnet.{i}.1.running_var"]),
        }

    cfg = FastSpeech2Config(
        vocab_size=idim, n_mels=odim, d_model=adim, num_heads=2, d_ff=64,
        encoder_layers=2, decoder_layers=2, predictor_layers=2,
        predictor_channels=16, predictor_kernel=3, postnet_layers=3,
        postnet_channels=24, dropout_rate=0.0,
    )
    model = FastSpeech2(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    loss, stats, mel_post = model.apply(
        variables,
        jnp.asarray(text.astype(np.int32)), jnp.full((b,), u, jnp.int32),
        jnp.asarray(mel), jnp.full((b,), t, jnp.int32),
        jnp.asarray(durations.astype(np.int32)),
        jnp.asarray(pitch[..., 0]), jnp.asarray(energy[..., 0]), True,
    )
    np.testing.assert_allclose(np.asarray(mel_post), t2n(after),
                               rtol=1e-4, atol=1e-4)

    def probe(m, text_, tl):
        hs = m._encode(text_, tl, True)
        return m._variance(hs, tl, True)

    d_pred, p_pred, e_pred, _ = model.apply(
        variables, jnp.asarray(text.astype(np.int32)),
        jnp.full((b,), u, jnp.int32), method=probe,
    )
    np.testing.assert_allclose(np.asarray(d_pred), t2n(d_out),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_pred), t2n(p_out)[..., 0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_pred), t2n(e_out)[..., 0],
                               rtol=1e-4, atol=1e-4)


def _lstm_cell(sd, ih, hh, bih, bhh):
    """torch LSTM gate-stacked weights -> flax OptimizedLSTMCell params.
    torch rows are [i, f, g, o] blocks; flax wants per-gate ii/if/ig/io
    (input, no bias) and hi/hf/hg/ho (hidden, bias = b_ih + b_hh)."""
    w_ih, w_hh = t2n(sd[ih]), t2n(sd[hh])
    b = t2n(sd[bih]) + t2n(sd[bhh])
    h = w_hh.shape[1]
    gates = ["i", "f", "g", "o"]
    params = {}
    for gi, g in enumerate(gates):
        params[f"i{g}"] = {"kernel": w_ih[gi * h:(gi + 1) * h].T}
        params[f"h{g}"] = {"kernel": w_hh[gi * h:(gi + 1) * h].T,
                           "bias": b[gi * h:(gi + 1) * h]}
    return params


def _bn(sd, prefix):
    return (
        {"scale": t2n(sd[prefix + ".weight"]), "bias": t2n(sd[prefix + ".bias"])},
        {"mean": t2n(sd[prefix + ".running_mean"]),
         "var": t2n(sd[prefix + ".running_var"])},
    )


def test_tacotron2_parity():
    """Teacher-forced Tacotron2 forward vs `espnet2/tts/tacotron2/tacotron2.py:26`
    (BatchNorm conv encoder + BLSTM, AttLoc with cumulative weights, zoneout
    LSTM decoder in eval-expectation mode, BatchNorm postnet)."""
    from espnet2.tts.tacotron2.tacotron2 import Tacotron2 as TorchTaco2
    from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config

    idim, odim = 11, 5
    tt = TorchTaco2(
        idim=idim, odim=odim, embed_dim=16, elayers=1, eunits=16,
        econv_layers=2, econv_chans=16, econv_filts=5, adim=12,
        aconv_chans=4, aconv_filts=3, cumulate_att_w=True, dlayers=2,
        dunits=20, prenet_layers=2, prenet_units=8, postnet_layers=3,
        postnet_chans=12, postnet_filts=5, reduction_factor=1,
        use_batch_norm=True, use_concate=True, dropout_rate=0.0,
        zoneout_rate=0.1, use_guided_attn_loss=False,
    ).eval()
    sd = tt.state_dict()

    rng = np.random.RandomState(0)
    b, u, t = 2, 6, 9
    # reference forward eos-pads text internally; feed the padded sequence
    # (eos = idim - 1) to both sides and call the torch enc/dec directly
    text = rng.randint(1, idim - 1, (b, u + 1)).astype(np.int64)
    text[:, -1] = idim - 1
    mel = rng.randn(b, t, odim).astype(np.float32)
    with torch.no_grad():
        hs, hlens = tt.enc(torch.from_numpy(text),
                           torch.full((b,), u + 1, dtype=torch.long))
        after, before, logits, att_ws = tt.dec(
            hs, hlens, torch.from_numpy(mel))

    params = {
        "encoder": {
            "embed": {"embedding": t2n(sd["enc.embed.weight"])},
        },
        "att_mem_proj": dense(sd, "dec.att.mlp_enc"),
        "decoder": {
            "att_conv": {
                "kernel": t2n(sd["dec.att.loc_conv.weight"])[:, 0].transpose(
                    2, 1, 0)[:, :, :],
                "bias": np.zeros(4, np.float32),
            },
            "att_q": dense(sd, "dec.att.mlp_dec"),
            "att_f": dense(sd, "dec.att.mlp_att"),
            "att_v": {"kernel": t2n(sd["dec.att.gvec.weight"]).T},
            "feat_out": {"kernel": t2n(sd["dec.feat_out.weight"]).T,
                         "bias": np.zeros(odim, np.float32)},
            "prob_out": dense(sd, "dec.prob_out"),
        },
        "postnet": {},
    }
    batch_stats = {"encoder": {}, "postnet": {}}
    for i in range(2):
        params["encoder"][f"conv{i}"] = conv1d(sd, f"enc.convs.{i}.0")
        p, s = _bn(sd, f"enc.convs.{i}.1")
        params["encoder"][f"norm{i}"] = p
        batch_stats["encoder"][f"norm{i}"] = s
    params["encoder"]["OptimizedLSTMCell_0"] = _lstm_cell(
        sd, "enc.blstm.weight_ih_l0", "enc.blstm.weight_hh_l0",
        "enc.blstm.bias_ih_l0", "enc.blstm.bias_hh_l0")
    params["encoder"]["OptimizedLSTMCell_1"] = _lstm_cell(
        sd, "enc.blstm.weight_ih_l0_reverse", "enc.blstm.weight_hh_l0_reverse",
        "enc.blstm.bias_ih_l0_reverse", "enc.blstm.bias_hh_l0_reverse")
    for i in range(2):
        params["decoder"][f"lstm{i}"] = _lstm_cell(
            sd, f"dec.lstm.{i}.cell.weight_ih", f"dec.lstm.{i}.cell.weight_hh",
            f"dec.lstm.{i}.cell.bias_ih", f"dec.lstm.{i}.cell.bias_hh")
        params["decoder"][f"prenet{i}"] = dense(sd, f"dec.prenet.prenet.{i}.0")
    for i in range(3):
        params["postnet"][f"conv{i}"] = conv1d(sd, f"dec.postnet.postnet.{i}.0")
        p, s = _bn(sd, f"dec.postnet.postnet.{i}.1")
        params["postnet"][f"norm{i}"] = p
        batch_stats["postnet"][f"norm{i}"] = s

    cfg = Tacotron2Config(
        vocab_size=idim, n_mels=odim, embed_dim=16, encoder_conv_layers=2,
        encoder_conv_channels=16, encoder_conv_kernel=5,
        encoder_lstm_units=16, prenet_layers=2, prenet_units=8,
        decoder_lstm_units=20, decoder_lstm_layers=2, att_dim=12,
        att_conv_channels=4, att_conv_kernel=7, postnet_layers=3,
        postnet_channels=12, dropout_rate=0.0, zoneout_rate=0.1,
        use_guided_attn=False,
    )
    model = Tacotron2(cfg)
    variables = {"params": params, "batch_stats": batch_stats}

    def probe(m, text_, tl, mel_, ml):
        frames, stop_logits, att = m._teacher_forward(text_, tl, mel_, ml, True)
        bb, tt_ = mel_.shape[0], mel_.shape[1]
        mel_before = frames.reshape(bb, tt_, m.config.n_mels)
        mel_post = mel_before + m.postnet(mel_before, True)
        return mel_before, mel_post, stop_logits.reshape(bb, tt_), att

    mel_before, mel_post, stop_logits, att = model.apply(
        variables, jnp.asarray(text.astype(np.int32)),
        jnp.full((b,), u + 1, jnp.int32), jnp.asarray(mel),
        jnp.full((b,), t, jnp.int32), method=probe,
    )
    np.testing.assert_allclose(np.asarray(att), t2n(att_ws),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mel_before), t2n(before),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mel_post), t2n(after),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stop_logits), t2n(logits),
                               rtol=1e-4, atol=1e-4)
