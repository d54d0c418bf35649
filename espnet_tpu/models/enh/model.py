"""End-to-end speech enhancement/separation model.

Behavioral spec: reference `espnet2/enh/espnet_model.py:24`
(ESPnetEnhancementModel: `forward:69` = forward_enhance (`:178`, encoder ->
separator -> decoder) + forward_loss (`:213`, PIT-wrapped criterion over
speaker references); forward returns (loss, stats, weight)).

The TPU build fixes the common configuration: time-domain learned
filterbank (ConvEncoder/ConvDecoder) or STFT, one separator choice, PIT
SI-SNR (negative) as the training criterion — everything one jittable
function of statically-shaped arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.enh.layers import (
    ConvDecoder, ConvEncoder, STFTDecoder, STFTEncoder,
)
from espnet_tpu.models.enh.separators import (
    DANSeparator, RNNSeparator,
    ConformerSeparator, DPRNNSeparator, DPTNetSeparator, SkiMSeparator,
    TCNSeparator, TransformerSeparator,
)
from espnet_tpu.ops.enh_losses import (
    ci_sdr_loss, dpcl_loss, mask_label, mixit_solve, pit_solve,
    si_snr_loss, snr_loss, spectral_l1_loss, tf_mse_loss, time_mse_loss,
)


@dataclasses.dataclass(frozen=True)
class EnhConfig:
    num_spk: int = 2
    encoder_type: str = "conv"       # conv | stft
    # conv filterbank
    enc_channels: int = 256
    enc_kernel: int = 20
    enc_stride: int = 10
    # stft
    n_fft: int = 512
    hop_length: int = 128
    # separator
    separator_type: str = "tcn"  # tcn | dprnn | transformer | dptnet |
                                 # skim | conformer | rnn | dan | dc_crn |
                                 # dccrn | dpcl_e2e | svoice | ineube |
                                 # fasnet | beamformer
    tcn_layers: int = 8
    tcn_stacks: int = 3
    tcn_bottleneck: int = 128
    tcn_hidden: int = 512
    tcn_kernel: int = 3
    dprnn_blocks: int = 6
    dprnn_hidden: int = 128
    dprnn_chunk: int = 100
    rnn_layers: int = 3
    rnn_hidden: int = 256
    dan_emb_dim: int = 20
    # dpcl_e2e soft-kmeans (fixed-iteration scan, see dpcl_e2e.py)
    dpcl_alpha: float = 5.0
    dpcl_kmeans_iters: int = 10
    trans_d_model: int = 256
    trans_heads: int = 4
    trans_d_ff: int = 1024
    trans_layers: int = 4
    conformer_kernel: int = 15
    skim_segment: int = 20
    skim_mem_type: str = "hc"
    # dc_crn (complex masking; needs encoder_type="stft")
    dc_crn_channels: Any = (2, 16, 32, 64)
    dc_crn_hid_channels: int = 8
    dc_crn_block_layers: int = 5
    glstm_groups: int = 2
    glstm_layers: int = 2
    dc_crn_mode: str = "masking"
    # dccrn (complex U-Net + complex LSTM; needs encoder_type="stft")
    dccrn_rnn_layer: int = 2
    dccrn_rnn_units: int = 256
    dccrn_masking_mode: str = "E"    # E | C | R
    dccrn_kernel_num: Any = (32, 64, 128, 256, 256, 256)
    dccrn_use_noise_mask: bool = False
    # fasnet (separator_type="fasnet", multichannel time-domain)
    fasnet_enc_dim: int = 64
    fasnet_feature_dim: int = 64
    fasnet_hidden_dim: int = 128
    fasnet_layers: int = 4
    fasnet_segment_size: int = 50
    fasnet_win_ms: int = 4
    fasnet_context_ms: int = 16
    fasnet_sr: int = 16000
    # svoice (waveform-domain gated dual-path, own encoder/decoder)
    svoice_enc_dim: int = 128
    svoice_kernel: int = 8
    svoice_hidden: int = 128
    svoice_layers: int = 4
    svoice_segment: int = 20
    svoice_normalize: bool = False
    # ineube (iterative neural/beamforming, waveform-domain multichannel)
    ineube_mics: int = 1
    ineube_hid_chans: int = 32
    ineube_hid_chans_dense: int = 32
    ineube_tcn_repeats: int = 4
    ineube_tcn_blocks: int = 7
    ineube_tcn_channels: int = 384
    ineube_output_from: str = "dnn1"  # dnn1 | mfmcwf | dnn2
    ineube_n_chunks: int = 3
    ineube_freeze_dnn1: bool = False
    # neural beamformer (separator_type="beamformer", multichannel input)
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    bf_hidden: int = 128
    bf_layers: int = 2
    ref_channel: int = 0
    nonlinear: str = "relu"
    # loss — criterion+wrapper assembled like the reference's
    # `espnet2/tasks/enh.py` criterion/wrapper lists, collapsed to one
    # selector (`espnet2/enh/espnet_model.py:213` forward_loss):
    #   si_snr | snr | ci_sdr | time_mse      PIT over time-domain wavs
    #   tf_mse | spectral_l1                  PIT over est/ref magnitude STFTs
    #   mask_mse_ibm|irm|iam|psm|npsm         PIT over predicted vs ideal masks
    #   dpcl                                  deep-clustering affinity (DAN emb)
    #   mixit                                 mixture-invariant assignment
    # plugin separators (utils.registry "separator"): unknown
    # separator_type resolves there; called as cls(input_dim, num_spk,
    # **separator_conf) and must return (masked, lens, others)
    separator_conf: Any = None
    loss_type: str = "si_snr"
    ci_sdr_filter_length: int = 512
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32


class EnhancementModel(nn.Module):
    config: EnhConfig

    def setup(self):
        c = self.config
        if c.separator_type == "beamformer":
            # Multichannel WPE+MVDR front-end: works on waveforms directly
            # (`espnet2/enh/separator/neural_beamformer.py:15`).
            from espnet_tpu.models.enh.beamformer import BeamformerSeparator

            self.separator = BeamformerSeparator(
                c.n_fft, c.hop_length, c.use_wpe, c.wpe_taps, c.wpe_delay,
                c.bf_hidden, c.bf_layers, c.ref_channel, c.dtype,
                name="separator",
            )
            self.encoder = None
            self.decoder = None
            return
        if c.separator_type == "svoice":
            # Waveform-domain gated dual-path (own conv encoder/decoder,
            # `espnet2/enh/separator/svoice_separator.py:95`).
            from espnet_tpu.models.enh.svoice import SVoiceSeparator

            self.separator = SVoiceSeparator(
                enc_dim=c.svoice_enc_dim, kernel_size=c.svoice_kernel,
                hidden_size=c.svoice_hidden, num_spk=c.num_spk,
                num_layers=c.svoice_layers, segment_size=c.svoice_segment,
                bidirectional=True, input_normalize=c.svoice_normalize,
                dtype=c.dtype, name="separator",
            )
            self.encoder = None
            self.decoder = None
            return
        if c.separator_type == "ineube":
            # Iterative neural/beamforming enhancement, waveform-domain
            # multichannel (`espnet2/enh/separator/ineube_separator.py:16`).
            from espnet_tpu.models.enh.ineube import iNeuBeSeparator

            self.separator = iNeuBeSeparator(
                n_spk=c.num_spk, n_fft=c.n_fft, stride=c.hop_length,
                mic_channels=c.ineube_mics, hid_chans=c.ineube_hid_chans,
                hid_chans_dense=c.ineube_hid_chans_dense,
                tcn_repeats=c.ineube_tcn_repeats,
                tcn_blocks=c.ineube_tcn_blocks,
                tcn_channels=c.ineube_tcn_channels,
                output_from=c.ineube_output_from,
                n_chunks=c.ineube_n_chunks,
                freeze_dnn1=c.ineube_freeze_dnn1,
                dtype=c.dtype, name="separator",
            )
            self.encoder = None
            self.decoder = None
            return
        if c.separator_type == "fasnet":
            # Multichannel time-domain filter-and-sum: waveform in/out
            # (`espnet2/enh/separator/fasnet_separator.py:14`).
            from espnet_tpu.models.enh.fasnet import FaSNetSeparator

            self.separator = FaSNetSeparator(
                c.fasnet_enc_dim, c.fasnet_feature_dim, c.fasnet_hidden_dim,
                c.fasnet_layers, c.fasnet_segment_size, c.num_spk,
                win_ms=c.fasnet_win_ms, context_ms=c.fasnet_context_ms,
                sr=c.fasnet_sr, dtype=c.dtype, name="separator",
            )
            self.encoder = None
            self.decoder = None
            return
        if c.encoder_type == "conv":
            self.encoder = ConvEncoder(
                c.enc_channels, c.enc_kernel, c.enc_stride, c.dtype,
                name="encoder",
            )
            self.decoder = ConvDecoder(
                c.enc_channels, c.enc_kernel, c.enc_stride, c.dtype,
                name="decoder",
            )
            feat_dim = c.enc_channels
        elif c.encoder_type == "stft":
            self.encoder = STFTEncoder(c.n_fft, c.hop_length, c.dtype,
                                       name="encoder")
            self.decoder = STFTDecoder(c.n_fft, c.hop_length, c.dtype,
                                       name="decoder")
            feat_dim = self.encoder.output_dim
        else:
            raise ValueError(f"unknown encoder_type {c.encoder_type}")
        if c.separator_type == "tcn":
            self.separator = TCNSeparator(
                feat_dim, c.num_spk, c.tcn_layers, c.tcn_stacks,
                c.tcn_bottleneck, c.tcn_hidden, c.tcn_kernel,
                nonlinear=c.nonlinear, dtype=c.dtype, name="separator",
            )
        elif c.separator_type == "dprnn":
            self.separator = DPRNNSeparator(
                feat_dim, c.num_spk, c.dprnn_blocks, c.dprnn_hidden,
                c.dprnn_chunk, c.nonlinear, c.dtype, name="separator",
            )
        elif c.separator_type == "transformer":
            self.separator = TransformerSeparator(
                feat_dim, c.num_spk, c.trans_d_model, c.trans_heads,
                c.trans_d_ff, c.trans_layers, c.dropout_rate, c.nonlinear,
                c.dtype, name="separator",
            )
        elif c.separator_type == "dptnet":
            self.separator = DPTNetSeparator(
                feat_dim, c.num_spk, c.dprnn_blocks, 0, c.trans_heads,
                c.dprnn_hidden, c.dprnn_chunk, c.nonlinear, c.dropout_rate,
                c.dtype, name="separator",
            )
        elif c.separator_type == "skim":
            self.separator = SkiMSeparator(
                feat_dim, c.num_spk, c.dprnn_blocks, c.dprnn_hidden,
                c.skim_segment, True, c.skim_mem_type, c.nonlinear,
                c.dtype, name="separator",
            )
        elif c.separator_type == "conformer":
            self.separator = ConformerSeparator(
                feat_dim, c.num_spk, c.trans_d_model, c.trans_heads,
                c.trans_d_ff, c.trans_layers, c.conformer_kernel,
                c.dropout_rate, c.nonlinear, c.dtype, name="separator",
            )
        elif c.separator_type == "rnn":
            self.separator = RNNSeparator(
                feat_dim, c.num_spk, c.rnn_layers, c.rnn_hidden,
                nonlinear=c.nonlinear, dtype=c.dtype, name="separator",
            )
        elif c.separator_type == "dan":
            self.separator = DANSeparator(
                feat_dim, c.num_spk, c.rnn_layers, c.rnn_hidden,
                c.dan_emb_dim, c.dtype, name="separator",
            )
        elif c.separator_type == "dc_crn":
            from espnet_tpu.models.enh.dc_crn import DC_CRNSeparator

            if c.encoder_type != "stft":
                raise ValueError("dc_crn needs encoder_type='stft' "
                                 "(complex masking over STFT features)")
            self.separator = DC_CRNSeparator(
                feat_dim, c.num_spk,
                input_channels=tuple(c.dc_crn_channels),
                enc_hid_channels=c.dc_crn_hid_channels,
                enc_layers=c.dc_crn_block_layers,
                glstm_groups=c.glstm_groups, glstm_layers=c.glstm_layers,
                mode=c.dc_crn_mode, dtype=c.dtype, name="separator",
            )
        elif c.separator_type == "dpcl_e2e":
            from espnet_tpu.models.enh.dpcl_e2e import DPCLE2ESeparator

            self.separator = DPCLE2ESeparator(
                feat_dim, c.num_spk,
                nonlinear=c.nonlinear,
                layers=c.rnn_layers, unit=c.rnn_hidden,
                emb_dim=c.dan_emb_dim, alpha=c.dpcl_alpha,
                kmeans_iters=c.dpcl_kmeans_iters,
                complex_pairs=c.encoder_type == "stft",
                dtype=c.dtype, name="separator",
            )
        elif c.separator_type == "dccrn":
            from espnet_tpu.models.enh.dccrn import DCCRNSeparator

            if c.encoder_type != "stft":
                raise ValueError("dccrn needs encoder_type='stft' "
                                 "(complex masking over STFT features)")
            self.separator = DCCRNSeparator(
                feat_dim, c.num_spk,
                rnn_layer=c.dccrn_rnn_layer,
                rnn_units=c.dccrn_rnn_units,
                masking_mode=c.dccrn_masking_mode,
                kernel_num=tuple(c.dccrn_kernel_num),
                use_noise_mask=c.dccrn_use_noise_mask,
                dtype=c.dtype, name="separator",
            )
        else:
            from espnet_tpu.utils.registry import resolve

            cls = resolve(
                "separator", c.separator_type,
                f"unknown separator_type {c.separator_type}",
            )
            self.separator = cls(
                feat_dim, c.num_spk,
                **dict(c.separator_conf or {}), name="separator",
            )

    def forward_enhance(self, speech_mix, speech_lengths,
                        deterministic: bool = True):
        """Mixture -> per-speaker waveforms (B, n_spk, n)
        (`espnet_model.py:178`)."""
        if self.config.separator_type in ("beamformer", "fasnet", "svoice",
                                          "ineube"):
            wavs, _, others = self.separator(
                speech_mix, speech_lengths, deterministic
            )
            return wavs, others
        n = speech_mix.shape[1]
        feat, flens = self.encoder(speech_mix, speech_lengths)
        masked, _, others = self.separator(feat, flens, deterministic)
        b, c_spk = masked.shape[0], masked.shape[1]
        flat = masked.reshape(b * c_spk, *masked.shape[2:])
        wavs = self.decoder(flat, n)
        return wavs.reshape(b, c_spk, n), others

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref,
                 deterministic: bool = True):
        """speech_ref: (B, n, n_spk) (collate layout — sample axis padded)
        or (B, n_spk, n). Returns (loss, stats)
        (`espnet_model.py:69` + the criterion/wrapper dispatch of
        `espnet_model.py:213` forward_loss)."""
        c = self.config
        if speech_ref.shape[-1] == c.num_spk:
            speech_refs = speech_ref.transpose(0, 2, 1)
        else:
            speech_refs = speech_ref
        est, others = self.forward_enhance(
            speech_mix, speech_mix_lengths, deterministic
        )
        return self.forward_loss(
            est, others, speech_mix, speech_mix_lengths, speech_refs
        )

    # --- loss dispatch ----------------------------------------------------
    def _stft(self, wav):
        from espnet_tpu.ops.stft import stft

        c = self.config
        return stft(wav, c.n_fft, c.hop_length)

    def _stft_lens(self, lengths):
        from espnet_tpu.ops.stft import stft_frames_lengths

        c = self.config
        return stft_frames_lengths(lengths, c.n_fft, c.hop_length)

    def forward_loss(self, est, others, speech_mix, speech_mix_lengths,
                     speech_refs):
        """est (B, n_spk, n) waveforms; speech_refs (B, n_spk, n).

        Criterion+wrapper table (reference `espnet2/tasks/enh.py` builds
        these from config lists; `pit_solver.py:10`, `mixit_solver.py:13`):
        every entry of `ops/enh_losses.py` is selectable here and therefore
        from `bin/enh_train.py --model.loss_type`.
        """
        c = self.config
        lt = c.loss_type
        stats: Dict[str, jnp.ndarray] = {}

        time_crits = {
            "si_snr": si_snr_loss,
            "snr": snr_loss,
            "time_mse": time_mse_loss,
            "ci_sdr": lambda r, e, ln: ci_sdr_loss(
                r, e, ln, filter_length=c.ci_sdr_filter_length),
        }
        if lt in time_crits:
            crit = time_crits[lt]
            loss_fn = lambda r, e: crit(r, e, speech_mix_lengths)
            best, _ = pit_solve(loss_fn, speech_refs, est)
            loss = jnp.mean(best)
            if lt == "si_snr":
                stats["si_snr"] = -loss
            stats["loss"] = loss
            return loss, stats

        if lt == "mixit":
            # mixture-invariant training: the "refs" are mixtures of
            # sources; each estimate is assigned to one mixture and the
            # assigned sums are scored (`wrappers/mixit_solver.py:13`).
            loss_fn = lambda r, e: si_snr_loss(r, e, speech_mix_lengths)
            best, _ = mixit_solve(loss_fn, speech_refs, est)
            loss = jnp.mean(best)
            stats["loss"] = loss
            return loss, stats

        if lt in ("tf_mse", "spectral_l1"):
            # frequency-domain criterion over magnitude spectra of the
            # estimated vs reference waveforms (`tf_domain.py`
            # FrequencyDomainMSE/L1 with compute_on_mask=False), PIT-wrapped.
            flens = self._stft_lens(speech_mix_lengths)
            def mag(w):
                re, im = self._stft(w)
                return jnp.sqrt(re ** 2 + im ** 2 + 1e-8)
            b, s, n = est.shape
            est_mag = mag(est.reshape(b * s, n))
            ref_mag = mag(speech_refs.reshape(b * s, n))
            est_mag = est_mag.reshape(b, s, *est_mag.shape[1:])
            ref_mag = ref_mag.reshape(b, s, *ref_mag.shape[1:])
            crit = tf_mse_loss if lt == "tf_mse" else spectral_l1_loss
            loss_fn = lambda r, e: crit(r, e, flens)
            best, _ = pit_solve(loss_fn, ref_mag, est_mag)
            loss = jnp.mean(best)
            stats["loss"] = loss
            return loss, stats

        if lt.startswith("mask_mse_"):
            # masked TF-MSE between the separator's predicted masks and the
            # ideal mask labels (`tf_domain.py:17` _create_mask_label +
            # FrequencyDomainMSE(compute_on_mask=True)), PIT-wrapped.
            mask_type = lt[len("mask_mse_"):].upper()
            if c.encoder_type != "stft" or "mask_spk1" not in others:
                raise ValueError(
                    "mask_mse_* needs encoder_type='stft' and a masking "
                    "separator (predicted TF masks)")
            mix_re, mix_im = self._stft(speech_mix)
            flens = self._stft_lens(speech_mix_lengths)
            f = mix_re.shape[-1]
            labels, preds = [], []
            for i in range(c.num_spk):
                ref_re, ref_im = self._stft(speech_refs[:, i])
                labels.append(mask_label(
                    mix_re, mix_im, ref_re, ref_im, mask_type))
                m = others[f"mask_spk{i + 1}"]
                if m.shape[-1] == 2 * f:
                    # masks live on the concat(real, imag) feature axis of
                    # the STFT encoder; the magnitude mask is the mean of
                    # the two halves
                    m = 0.5 * (m[..., :f] + m[..., f:])
                preds.append(m)
            labels = jnp.stack(labels, axis=1)          # (B, S, T, F)
            preds = jnp.stack(preds, axis=1)
            loss_fn = lambda r, e: tf_mse_loss(r, e, flens)
            best, _ = pit_solve(loss_fn, labels, preds)
            loss = jnp.mean(best)
            stats["loss"] = loss
            return loss, stats

        if lt == "dpcl":
            # deep-clustering affinity loss over unit-norm TF embeddings
            # vs one-hot dominance labels (`tf_domain.py`
            # FrequencyDomainDPCL); fixed-order (no PIT — the loss is
            # permutation-free by construction).
            if "embedding" not in others:
                raise ValueError(
                    "loss_type='dpcl' needs a separator exposing TF "
                    "embeddings (separator_type='dan')")
            emb = others["embedding"]                   # (B, TF, D)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            mix_re, _ = self._stft(speech_mix)
            b, t, f = mix_re.shape
            mags = []
            for i in range(c.num_spk):
                re, im = self._stft(speech_refs[:, i])
                mags.append(jnp.sqrt(re ** 2 + im ** 2 + 1e-8))
            mags = jnp.stack(mags, axis=-1)             # (B, T, F, S)
            dom = jnp.argmax(mags, axis=-1)             # (B, T, F)
            if emb.shape[1] == t * 2 * f:
                # embeddings live on the concat(real, imag) feature axis of
                # the STFT encoder: the dominance label of a bin applies to
                # both its real and imag slots
                dom = jnp.concatenate([dom, dom], axis=-1)
            elif emb.shape[1] != t * f:
                raise ValueError(
                    f"embedding TF axis {emb.shape[1]} matches neither "
                    f"T*F={t * f} nor T*2F — dpcl needs encoder_type='stft'"
                    " with matching n_fft/hop_length")
            n_bins = emb.shape[1]
            ref_masks = jax.nn.one_hot(
                dom.reshape(b, n_bins), c.num_spk, dtype=emb.dtype)
            loss = jnp.mean(dpcl_loss(emb, ref_masks)) / n_bins
            stats["loss"] = loss
            return loss, stats

        raise ValueError(f"unknown loss_type {lt}")
