"""Target speaker extraction (TSE): TD-SpeakerBeam.

Behavioral spec: reference `espnet2/enh/espnet_model_tse.py`
(ESPnetExtractionModel: encoder -> extractor(informed by an enrollment
utterance) -> decoder, SI-SNR vs the target source — no PIT) and
`espnet2/enh/extractor/td_speakerbeam_extractor.py` (TDSpeakerBeamExtractor:
main TCN with a multiplicative adaptation layer at index `i_adapt_layer`
driven by a speaker embedding from an auxiliary TCN over the enrollment,
`espnet2/enh/layers/adapt_layers.py` "mul").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.enh.layers import (
    ChannelwiseLayerNorm, ConvDecoder, ConvEncoder, TCNBlock,
)
from espnet_tpu.ops.enh_losses import si_snr_loss, snr_loss
from espnet_tpu.ops.masks import make_valid_mask


class TDSpeakerBeamExtractor(nn.Module):
    """Informed Conv-TasNet mask network
    (`td_speakerbeam_extractor.py:13`)."""

    input_dim: int
    layers: int = 8
    stacks: int = 3
    bottleneck: int = 128
    hidden: int = 512
    kernel: int = 3
    norm_type: str = "gLN"
    nonlinear: str = "relu"
    i_adapt_layer: int = 7          # flat layer index of the adaptation
    adapt_enroll_dim: int = 128
    aux_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, enroll_feat, enroll_lengths):
        # feat (B, T, N); enroll_feat (B, Te, N) -> mask (B, T, N)
        # --- auxiliary net: enrollment -> speaker embedding -------------
        e = ChannelwiseLayerNorm(self.input_dim, name="aux_ln")(enroll_feat)
        e = nn.Dense(self.bottleneck, dtype=self.dtype,
                     name="aux_bottleneck")(e)
        for l in range(self.aux_layers):
            e, _ = TCNBlock(
                self.bottleneck, self.hidden, self.kernel, 2 ** l,
                self.norm_type, False, self.dtype, name=f"aux_layer{l}",
            )(e)
        e = nn.Dense(self.adapt_enroll_dim, dtype=self.dtype,
                     name="aux_out")(e)
        emask = make_valid_mask(enroll_lengths, e.shape[1])[..., None]
        emb = jnp.sum(e * emask.astype(e.dtype), axis=1) / jnp.maximum(
            jnp.sum(emask, axis=1), 1.0
        )  # (B, adapt_enroll_dim)

        # --- main informed TCN ------------------------------------------
        x = ChannelwiseLayerNorm(self.input_dim, name="ln")(feat)
        x = nn.Dense(self.bottleneck, dtype=self.dtype, name="bottleneck")(x)
        skip_sum = 0.0
        flat = 0
        for s in range(self.stacks):
            for l in range(self.layers):
                if flat == self.i_adapt_layer:
                    # multiplicative adaptation (`adapt_layers.py` "mul")
                    scale = nn.Dense(self.bottleneck, dtype=self.dtype,
                                     name="adapt_mul")(emb)
                    x = x * scale[:, None, :]
                x, skip = TCNBlock(
                    self.bottleneck, self.hidden, self.kernel, 2 ** l,
                    self.norm_type, False, self.dtype,
                    name=f"stack{s}_layer{l}",
                )(x)
                skip_sum = skip_sum + skip
                flat += 1
        h = nn.PReLU()(skip_sum)
        h = nn.Dense(self.input_dim, dtype=self.dtype, name="mask_out")(h)
        if self.nonlinear == "relu":
            return nn.relu(h)
        if self.nonlinear == "sigmoid":
            return nn.sigmoid(h)
        return nn.tanh(h)


@dataclasses.dataclass(frozen=True)
class TSEConfig:
    enc_channels: int = 256
    enc_kernel: int = 20
    enc_stride: int = 10
    layers: int = 8
    stacks: int = 3
    bottleneck: int = 128
    hidden: int = 512
    kernel: int = 3
    i_adapt_layer: int = 7
    adapt_enroll_dim: int = 128
    aux_layers: int = 4
    nonlinear: str = "relu"
    loss_type: str = "si_snr"
    dtype: Any = jnp.float32


class TSEModel(nn.Module):
    """`espnet_model_tse.py:19` ESPnetExtractionModel equivalent."""

    config: TSEConfig

    def setup(self):
        c = self.config
        self.encoder = ConvEncoder(c.enc_channels, c.enc_kernel,
                                   c.enc_stride, c.dtype, name="encoder")
        self.decoder = ConvDecoder(c.enc_channels, c.enc_kernel,
                                   c.enc_stride, c.dtype, name="decoder")
        self.extractor = TDSpeakerBeamExtractor(
            c.enc_channels, c.layers, c.stacks, c.bottleneck, c.hidden,
            c.kernel, "gLN", c.nonlinear, c.i_adapt_layer,
            c.adapt_enroll_dim, c.aux_layers, c.dtype, name="extractor",
        )

    def forward_enhance(self, speech_mix, speech_lengths, enroll,
                        enroll_lengths, deterministic: bool = True):
        n = speech_mix.shape[1]
        feat, flens = self.encoder(speech_mix, speech_lengths)
        efeat, eflens = self.encoder(enroll, enroll_lengths)
        mask = self.extractor(feat, efeat, eflens)
        wav = self.decoder(feat * mask, n)
        return wav, {"mask_spk1": mask}

    def __call__(self, speech_mix, speech_mix_lengths, enroll,
                 enroll_lengths, speech_ref,
                 deterministic: bool = True):
        """speech_ref: (B, n) the target source. No PIT — the enrollment
        selects the speaker (`espnet_model_tse.py:194`)."""
        c = self.config
        if speech_ref.ndim == 3:
            speech_ref = speech_ref[..., 0]
        est, _ = self.forward_enhance(
            speech_mix, speech_mix_lengths, enroll, enroll_lengths,
            deterministic,
        )
        crit = si_snr_loss if c.loss_type == "si_snr" else snr_loss
        loss = jnp.mean(crit(speech_ref, est, speech_mix_lengths))
        stats = {"loss": loss}
        if c.loss_type == "si_snr":
            stats["si_snr"] = -loss
        return loss, stats
