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
