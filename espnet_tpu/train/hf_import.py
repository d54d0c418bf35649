"""Convert HuggingFace torch checkpoints (wav2vec2/HuBERT/Whisper) into
flax parameter trees for `espnet_tpu.models.ssl`.

Replaces the reference's runtime dependency on fairseq/s3prl/whisper hubs
(`espnet2/asr/encoder/wav2vec2_encoder.py:1`, `hubert_encoder.py`,
`whisper_encoder.py`, `espnet2/asr/frontend/s3prl.py:1`): instead of
wrapping torch modules, checkpoints are converted once, offline, into
native arrays. Conversion is pure numpy on a `state_dict()`-style mapping
(torch tensors or numpy arrays), so it works with `torch.load`-ed files,
safetensors dicts, or live `transformers` models.

Layout conventions converted here:
- torch Linear (out, in)           -> flax Dense kernel (in, out)
- torch Conv1d (out, in/groups, k) -> flax Conv kernel (k, in/groups, out)
- torch weight-norm parametrization (original0=g, original1=v, dim=2)
  is collapsed to the effective kernel: w = g * v / ||v||_{dims 0,1}.
- LayerNorm/GroupNorm weight/bias  -> scale/bias.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _norm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _weight_norm_conv(sd: Mapping, prefix: str) -> Dict:
    """Collapse torch weight_norm (dim=2) to a plain flax conv kernel."""
    if prefix + ".parametrizations.weight.original0" in sd:  # torch >= 2.1
        g = _np(sd[prefix + ".parametrizations.weight.original0"])
        v = _np(sd[prefix + ".parametrizations.weight.original1"])
    else:  # legacy weight_g/weight_v
        g = _np(sd[prefix + ".weight_g"])
        v = _np(sd[prefix + ".weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, k)
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[prefix + ".bias"])}


def _hf_attention(sd: Mapping, prefix: str, k_bias: bool = True) -> Dict:
    return {
        "q_proj": _dense(sd, prefix + ".q_proj"),
        "k_proj": _dense(sd, prefix + ".k_proj", bias=k_bias),
        "v_proj": _dense(sd, prefix + ".v_proj"),
        "out_proj": _dense(sd, prefix + ".out_proj"),
    }


def wav2vec2_params_from_torch(sd: Mapping, cfg) -> Dict:
    """HF Wav2Vec2Model/HubertModel state_dict -> ssl.Wav2Vec2Model params.

    `cfg` is an `espnet_tpu.models.ssl.SSLConfig` describing the same
    geometry (see `ssl_config_from_hf`).
    """
    sd = dict(sd)
    fe: Dict = {}
    for i in range(len(cfg.conv_dim)):
        fe[f"conv{i}"] = _conv(sd, f"feature_extractor.conv_layers.{i}.conv")
        if cfg.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = _norm(
                sd, "feature_extractor.conv_layers.0.layer_norm")
        elif cfg.feat_extract_norm == "layer":
            fe[f"norm{i}"] = _norm(
                sd, f"feature_extractor.conv_layers.{i}.layer_norm")

    params: Dict = {
        "feature_extractor": fe,
        "projection": _dense(sd, "feature_projection.projection"),
        "pos_conv": _weight_norm_conv(sd, "encoder.pos_conv_embed.conv"),
        "norm": _norm(sd, "encoder.layer_norm"),
    }
    if cfg.feat_proj_layer_norm:
        params["proj_norm"] = _norm(sd, "feature_projection.layer_norm")
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "attention": _hf_attention(sd, p + ".attention"),
            "layer_norm": _norm(sd, p + ".layer_norm"),
            "intermediate_dense": _dense(
                sd, p + ".feed_forward.intermediate_dense"),
            "output_dense": _dense(sd, p + ".feed_forward.output_dense"),
            "final_layer_norm": _norm(sd, p + ".final_layer_norm"),
        }
    return params


def ssl_config_from_hf(hf_config) -> "SSLConfig":
    """Build an SSLConfig from a transformers Wav2Vec2Config/HubertConfig."""
    from espnet_tpu.models.ssl import SSLConfig

    return SSLConfig(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        ffn_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        feat_extract_norm=hf_config.feat_extract_norm,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        do_stable_layer_norm=getattr(hf_config, "do_stable_layer_norm", False),
        feat_proj_layer_norm=getattr(hf_config, "feat_proj_layer_norm", True),
    )


def _whisper_layer(sd: Mapping, prefix: str, cross: bool) -> Dict:
    out = {
        "self_attn": _hf_attention(sd, prefix + ".self_attn", k_bias=False),
        "self_attn_layer_norm": _norm(sd, prefix + ".self_attn_layer_norm"),
        "fc1": _dense(sd, prefix + ".fc1"),
        "fc2": _dense(sd, prefix + ".fc2"),
        "final_layer_norm": _norm(sd, prefix + ".final_layer_norm"),
    }
    if cross:
        out["encoder_attn"] = _hf_attention(
            sd, prefix + ".encoder_attn", k_bias=False)
        out["encoder_attn_layer_norm"] = _norm(
            sd, prefix + ".encoder_attn_layer_norm")
    return out


def whisper_encoder_params_from_torch(sd: Mapping, cfg) -> Dict:
    """HF WhisperModel `encoder.*` state_dict -> ssl.WhisperEncoder params.

    Pass the full model state_dict; keys are addressed with their
    `encoder.` prefix.
    """
    params: Dict = {
        "conv1": _conv(sd, "encoder.conv1"),
        "conv2": _conv(sd, "encoder.conv2"),
        "positions": _np(sd["encoder.embed_positions.weight"]),
        "norm": _norm(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        params[f"layer{i}"] = _whisper_layer(
            sd, f"encoder.layers.{i}", cross=False)
    return params


def whisper_decoder_params_from_torch(sd: Mapping, cfg) -> Dict:
    params: Dict = {
        "embed_tokens": {"embedding": _np(sd["decoder.embed_tokens.weight"])},
        "positions": _np(sd["decoder.embed_positions.weight"]),
        "norm": _norm(sd, "decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        params[f"layer{i}"] = _whisper_layer(
            sd, f"decoder.layers.{i}", cross=True)
    return params


def whisper_config_from_hf(hf_config) -> "WhisperConfig":
    from espnet_tpu.models.ssl import WhisperConfig

    return WhisperConfig(
        vocab_size=hf_config.vocab_size,
        n_mels=hf_config.num_mel_bins,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        ffn_size=hf_config.encoder_ffn_dim,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
    )


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into a {key: np.ndarray} dict. Supports
    torch .pt/.bin (torch is CPU-installed in this image) and .safetensors."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}
