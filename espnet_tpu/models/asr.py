"""End-to-end ASR model: frontend -> specaug -> normalize -> encoder -> {ctc, decoder}.

Behavioral spec: reference `espnet2/asr/espnet_model.py:37` (ESPnetASRModel):
`forward:188` computes loss = ctc_weight * loss_ctc + (1-ctc_weight) * loss_att
(`:319-325`), attention loss is label-smoothed CE over [ys, eos] with
sos-prefixed decoder input, stats include loss/loss_att/loss_ctc/acc;
`encode:351` is the frontend+encoder path reused by inference.

TPU-first shape discipline: speech is (B, N_samples) padded to a bucket
size, text is (B, U) 0-padded with explicit lengths; everything downstream
is static-shaped, masked math. sos = eos = vocab_size - 1 (reference
convention, `espnet2/tasks/asr.py` token list layout with <sos/eos> last).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.conformer import ConformerEncoder
from espnet_tpu.models.transformer import TransformerDecoder, TransformerEncoder
from espnet_tpu.ops.ctc import ctc_loss
from espnet_tpu.ops.losses import label_smoothing_loss, token_accuracy
from espnet_tpu.ops.masks import make_valid_mask
from espnet_tpu.ops.specaug import specaug
from espnet_tpu.ops.stft import log_mel_spectrogram
from espnet_tpu.ops.normalize import utterance_mvn


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    vocab_size: int
    # frontend: "raw" (log-mel) | "feats" precomputed | "sinc"
    # (LightweightSincConvs) | "sliding_window" (raw frames,
    # `espnet2/asr/frontend/windowing.py`) | "fused" (two log-mel
    # resolutions concatenated, `espnet2/asr/frontend/fused.py`)
    input_type: str = "raw"
    sinc_out_dim: int = 256  # LightweightSincConvs output dim
    fused_n_fft2: int = 0    # second resolution for "fused" (0 = 2*n_fft)
    # multichannel front-end (reference `--use-frontend`,
    # `espnet/nets/pytorch_backend/frontends/frontend.py`: optional DNN-WPE
    # dereverb + mask-MVDR beamformer between STFT and log-mel, trained
    # jointly from the ASR loss). Active when num_channels > 1 and
    # input_type == "raw"; speech then arrives as (B, N, C).
    num_channels: int = 1
    use_wpe: bool = False
    use_beamformer: bool = True
    wpe_taps: int = 5
    wpe_delay: int = 3
    ref_channel: int = 0
    frontend_hidden: int = 128
    frontend_layers: int = 2
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    win_length: Optional[int] = None
    n_mels: int = 80
    # DFT/mel matmul precision: "high" (3-pass) deviates from "highest"
    # by <=1.1e-3 in log-mel space (measured, ops/stft.py) at ~20% less
    # frontend time; precision flags are no-ops on CPU.
    frontend_precision: str = "high"
    # augmentation / normalisation
    use_specaug: bool = True
    num_freq_masks: int = 2
    freq_mask_width: Tuple[int, int] = (0, 20)
    num_time_masks: int = 2
    time_mask_width: Tuple[int, int] = (0, 40)
    normalize: str = "global_mvn"  # "global_mvn" | "utterance_mvn" | "none"
    # encoder
    # conformer | transformer | branchformer | e_branchformer |
    # contextual_block_conformer | longformer | vgg_blstm
    encoder_type: str = "conformer"
    # longformer band half-width, in subsampled frames
    attention_window: int = 100
    # streaming (contextual_block_conformer) geometry, in subsampled frames
    block_size: int = 40
    stream_hop_size: int = 16
    look_ahead: int = 16
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_encoder_layers: int = 12
    subsampling_factor: int = 4
    # rematerialize encoder blocks in bwd (jax.checkpoint): less activation
    # HBM -> larger batches / higher MFU at ~1/3 extra encoder fwd FLOPs
    remat_encoder: bool = False
    # compile the encoder stack as one nn.scan over weight-stacked blocks:
    # ~depth-fold faster XLA compiles at identical math (checkpoint layout
    # changes to stacked leaves; incompatible with interctc_layer_idx)
    scan_encoder_layers: bool = False
    conformer_kernel_size: int = 31
    # pretrained SSL / Whisper integration (ingested HF checkpoints via
    # train/hf_import; `espnet2/asr/encoder/wav2vec2_encoder.py:1`,
    # `hubert_encoder.py`, `whisper_encoder.py`,
    # `espnet2/asr/frontend/s3prl.py:1`). Select with
    # input_type="ssl" (S3PRL featurizer frontend + any encoder above),
    # encoder_type="wav2vec2" (trunk as the encoder), or
    # encoder_type/decoder_type="whisper". `ssl`/`whisper` take
    # models.ssl.SSLConfig/WhisperConfig instances or plain dicts (YAML).
    ssl: Any = None
    whisper: Any = None
    ssl_freeze: bool = True
    # decoder
    decoder_type: str = "transformer"  # transformer | rnn (v1 AttLoc) | s4 | whisper
    num_decoder_layers: int = 6
    decoder_d_ff: int = 2048
    # rnn decoder options (v1 `--atype` zoo, rnn_attentions.py, and
    # scheduled sampling `--sampling-probability`, decoders.py:246)
    rnn_att_type: str = "location"
    sampling_probability: float = 0.0
    # plugin components (`espnet2/train/class_choices.py:1` equivalent):
    # an encoder_type/decoder_type not in the builtin lists is resolved
    # against utils.registry ("encoder"/"decoder"); the *_conf dict is the
    # plugin module's full constructor kwargs (it must produce c.d_model-
    # sized encoder outputs / standard decoder signature)
    encoder_conf: Any = None
    decoder_conf: Any = None
    # loss
    ctc_weight: float = 0.3
    # InterCTC (`espnet2/asr/espnet_model.py:244-286`): auxiliary CTC on
    # intermediate encoder layers (1-based indices), mixed into loss_ctc
    interctc_layer_idx: Tuple[int, ...] = ()
    interctc_weight: float = 0.0
    lsm_weight: float = 0.1
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def blank_id(self) -> int:
        return 0


class GlobalMVN(nn.Module):
    """Mean/variance normalisation with stats in a non-trainable 'mvn'
    variable collection (filled by the collect-stats pass,
    `espnet2/layers/global_mvn.py:13`)."""

    dim: int

    @nn.compact
    def __call__(self, x, lengths):
        mean = self.variable("mvn", "mean", lambda: jnp.zeros((self.dim,))).value
        inv_std = self.variable("mvn", "inv_std", lambda: jnp.ones((self.dim,))).value
        out = (x - mean) * inv_std
        mask = make_valid_mask(lengths, x.shape[1])[:, :, None]
        return out * mask.astype(out.dtype)


def add_sos_eos(
    text: jnp.ndarray, text_lengths: jnp.ndarray, sos: int, eos: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, U) -> decoder input [sos, y] (B, U+1), target [y, eos] (B, U+1),
    and the (B,) output lengths (= text_lengths + 1).

    Mirror of `espnet/nets/pytorch_backend/nets_utils.py` add_sos_eos, with
    0-padding instead of ignore_id (-1) — masking carries validity.
    """
    b, u = text.shape
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, text.dtype), text], axis=1
    )
    # place eos at position text_lengths in the target
    ys_out = jnp.concatenate([text, jnp.zeros((b, 1), text.dtype)], axis=1)
    pos = jnp.arange(u + 1)[None, :]
    ys_out = jnp.where(pos == text_lengths[:, None], eos, ys_out)
    ys_out = jnp.where(pos > text_lengths[:, None], 0, ys_out)
    return ys_in, ys_out, text_lengths + 1


def _coerce_section(value, kind: str, dtype):
    """Rebuild a nested models.ssl config section. YAML/asdict round-trips
    turn nested dataclasses into plain dicts (and tuples into lists); this
    restores the dataclass and pins its compute dtype to the model dtype."""
    if value is None:
        return None
    from espnet_tpu.models import ssl as ssl_mod

    cls = getattr(ssl_mod, kind)
    if isinstance(value, cls):
        return dataclasses.replace(value, dtype=dtype)
    d = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in dict(value).items()
    }
    d.pop("dtype", None)
    return cls(dtype=dtype, **d)


class ASRModel(nn.Module):
    """Joint CTC/attention ASR model (ESPnetASRModel equivalent)."""

    config: ASRConfig

    def setup(self):
        c = self.config
        if c.interctc_layer_idx and c.encoder_type not in (
            "conformer", "transformer"
        ):
            raise ValueError(
                "interctc_layer_idx requires a conformer/transformer encoder"
            )
        self._ssl_cfg = _coerce_section(c.ssl, "SSLConfig", c.dtype)
        self._whisper_cfg = _coerce_section(c.whisper, "WhisperConfig", c.dtype)
        if c.input_type == "ssl":
            from espnet_tpu.models.ssl import SSLFrontend

            self.ssl_frontend = SSLFrontend(
                self._ssl_cfg, freeze=c.ssl_freeze, name="ssl_frontend"
            )
        if c.encoder_type == "wav2vec2":
            from espnet_tpu.models.ssl import Wav2Vec2ASREncoder

            self.encoder = Wav2Vec2ASREncoder(
                self._ssl_cfg, output_size=c.d_model, freeze=c.ssl_freeze
            )
        elif c.encoder_type == "whisper":
            from espnet_tpu.models.ssl import WhisperEncoder

            self.encoder = WhisperEncoder(self._whisper_cfg)
        elif c.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                d_model=c.d_model,
                num_heads=c.num_heads,
                d_ff=c.d_ff,
                num_layers=c.num_encoder_layers,
                kernel_size=c.conformer_kernel_size,
                dropout_rate=c.dropout_rate,
                subsampling_factor=c.subsampling_factor,
                capture_layers=tuple(c.interctc_layer_idx),
                remat=c.remat_encoder,
                scan_layers=c.scan_encoder_layers,
                dtype=c.dtype,
            )
        elif c.encoder_type == "transformer":
            self.encoder = TransformerEncoder(
                d_model=c.d_model,
                num_heads=c.num_heads,
                d_ff=c.d_ff,
                num_layers=c.num_encoder_layers,
                dropout_rate=c.dropout_rate,
                subsampling_factor=c.subsampling_factor,
                capture_layers=tuple(c.interctc_layer_idx),
                remat=c.remat_encoder,
                dtype=c.dtype,
            )
        elif c.encoder_type in ("branchformer", "e_branchformer"):
            from espnet_tpu.models.branchformer import BranchformerEncoder

            self.encoder = BranchformerEncoder(
                d_model=c.d_model,
                num_heads=c.num_heads,
                d_ff=c.d_ff,
                num_layers=c.num_encoder_layers,
                cgmlp_hidden=c.d_ff,
                cgmlp_kernel=c.conformer_kernel_size,
                dropout_rate=c.dropout_rate,
                subsampling_factor=c.subsampling_factor,
                variant=c.encoder_type,
                dtype=c.dtype,
            )
        elif c.encoder_type == "longformer":
            from espnet_tpu.models.longformer import LongformerEncoder

            self.encoder = LongformerEncoder(
                d_model=c.d_model,
                num_heads=c.num_heads,
                d_ff=c.d_ff,
                num_layers=c.num_encoder_layers,
                window=c.attention_window,
                kernel_size=c.conformer_kernel_size,
                dropout_rate=c.dropout_rate,
                subsampling_factor=c.subsampling_factor,
                dtype=c.dtype,
            )
        elif c.encoder_type in ("vgg_blstm", "vgg_lstm"):
            from espnet_tpu.models.rnn import VGGRNNEncoder

            self.encoder = VGGRNNEncoder(
                d_model=c.d_model,
                hidden=c.d_model,
                num_layers=c.num_encoder_layers,
                bidirectional=c.encoder_type == "vgg_blstm",
                dropout_rate=c.dropout_rate,
                dtype=c.dtype,
            )
        elif c.encoder_type == "contextual_block_conformer":
            from espnet_tpu.models.streaming import (
                ContextualBlockConformerEncoder,
            )

            self.encoder = ContextualBlockConformerEncoder(
                d_model=c.d_model,
                num_heads=c.num_heads,
                d_ff=c.d_ff,
                num_layers=c.num_encoder_layers,
                kernel_size=c.conformer_kernel_size,
                dropout_rate=c.dropout_rate,
                subsampling_factor=c.subsampling_factor,
                block_size=c.block_size,
                hop_size=c.stream_hop_size,
                look_ahead=c.look_ahead,
                dtype=c.dtype,
            )
        else:
            from espnet_tpu.utils.registry import resolve

            cls = resolve(
                "encoder", c.encoder_type,
                f"unknown encoder_type {c.encoder_type}",
            )
            self.encoder = cls(**dict(c.encoder_conf or {}))
        if c.ctc_weight < 1.0:
            if c.decoder_type == "s4":
                from espnet_tpu.models.s4_decoder import S4Decoder

                self.decoder = S4Decoder(
                    vocab_size=c.vocab_size,
                    d_model=c.d_model,
                    num_heads=c.num_heads,
                    d_ff=c.decoder_d_ff,
                    num_layers=c.num_decoder_layers,
                    dropout_rate=c.dropout_rate,
                    dtype=c.dtype,
                )
            elif c.decoder_type == "whisper":
                from espnet_tpu.models.ssl import WhisperDecoder

                self.decoder = WhisperDecoder(
                    dataclasses.replace(
                        self._whisper_cfg, vocab_size=c.vocab_size
                    )
                )
            elif c.decoder_type == "rnn":
                from espnet_tpu.models.rnn import RNNDecoder

                self.decoder = RNNDecoder(
                    vocab_size=c.vocab_size,
                    encoder_dim=c.d_model,
                    embed_dim=c.d_model,
                    hidden=c.d_model,
                    num_layers=c.num_decoder_layers,
                    att_type=c.rnn_att_type,
                    sampling_probability=c.sampling_probability,
                    dropout_rate=c.dropout_rate,
                    dtype=c.dtype,
                )
            elif c.decoder_type == "transformer":
                self.decoder = TransformerDecoder(
                    vocab_size=c.vocab_size,
                    d_model=c.d_model,
                    num_heads=c.num_heads,
                    d_ff=c.decoder_d_ff,
                    num_layers=c.num_decoder_layers,
                    dropout_rate=c.dropout_rate,
                    dtype=c.dtype,
                )
            else:
                from espnet_tpu.utils.registry import resolve

                cls = resolve(
                    "decoder", c.decoder_type,
                    f"unknown decoder_type {c.decoder_type}",
                )
                self.decoder = cls(**dict(c.decoder_conf or {}))
        if c.ctc_weight > 0.0:
            self.ctc_head = nn.Dense(
                c.vocab_size,
                dtype=c.dtype,
                name="ctc_head",
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.xavier_uniform(), ("embed", "vocab")
                ),
            )
        if c.num_channels > 1 and c.input_type == "raw":
            from espnet_tpu.models.enh.beamformer import DNNWPE, DNNBeamformer

            if c.use_wpe:
                self.wpe = DNNWPE(
                    c.wpe_taps, c.wpe_delay, c.frontend_hidden, 1,
                    dtype=jnp.float32, name="frontend_wpe",
                )
            if c.use_beamformer:
                self.beamformer = DNNBeamformer(
                    c.frontend_hidden, c.frontend_layers, c.ref_channel,
                    dtype=jnp.float32, name="frontend_beamformer",
                )
        if c.input_type == "sinc":
            from espnet_tpu.models.sinc import LightweightSincConvs

            self.sinc_frontend = LightweightSincConvs(
                fs=c.fs, win_length=c.win_length or 400,
                hop_length=c.hop_length, out_dim=c.sinc_out_dim,
                dropout_rate=c.dropout_rate, dtype=c.dtype,
                name="sinc_frontend",
            )
        if c.normalize == "global_mvn":
            feat_dim = {
                "sinc": c.sinc_out_dim,
                "sliding_window": c.win_length or 400,
                "fused": 2 * c.n_mels,
                "ssl": self._ssl_cfg.hidden_size if self._ssl_cfg else c.n_mels,
            }.get(c.input_type, c.n_mels)
            self.mvn = GlobalMVN(feat_dim)

    def _multichannel_frontend(self, speech, speech_lengths):
        """(B, N, C) multichannel wave -> (log-mel (B, T, n_mels), lens):
        STFT all channels -> optional DNN-WPE -> mask-MVDR beamformer (or
        reference-channel select) -> power -> log-mel. Mirrors reference
        `frontends/frontend.py:38` + `feature_transform.py` fbank."""
        from espnet_tpu.ops.stft import (
            log_mel, power_spectrum, stft, stft_frames_lengths,
        )

        c = self.config
        b, n, ch = speech.shape
        flat = speech.transpose(0, 2, 1).reshape(b * ch, n)
        real, imag = stft(flat, c.n_fft, c.hop_length, c.win_length)
        t, f = real.shape[1], real.shape[2]
        y = (real + 1j * imag).reshape(b, ch, t, f).transpose(0, 3, 1, 2)
        if c.use_wpe:
            y, _ = self.wpe(y)  # (B, F, C, T)
        if c.use_beamformer:
            spec, _ = self.beamformer(y)  # (B, F, T)
            p = (spec.real ** 2 + spec.imag ** 2).transpose(0, 2, 1)
        else:
            spec = y[:, :, c.ref_channel]  # (B, F, T)
            p = (spec.real ** 2 + spec.imag ** 2).transpose(0, 2, 1)
        feats = log_mel(p, c.fs, c.n_fft, c.n_mels)
        feat_lengths = stft_frames_lengths(
            speech_lengths, c.n_fft, c.hop_length
        )
        mask = make_valid_mask(feat_lengths, feats.shape[1])
        return feats * mask[:, :, None].astype(feats.dtype), feat_lengths

    def _frontend(self, speech, speech_lengths, deterministic: bool):
        c = self.config
        if c.encoder_type == "wav2vec2":
            # the SSL trunk consumes the raw waveform directly; no spectral
            # frontend / specaug / normalize (matches the reference's
            # wav2vec2_encoder preprocessing: none)
            return speech, speech_lengths
        if c.num_channels > 1 and c.input_type == "raw":
            feats, feat_lengths = self._multichannel_frontend(
                speech, speech_lengths
            )
        elif c.input_type == "ssl":
            feats, feat_lengths = self.ssl_frontend(
                speech, speech_lengths, deterministic
            )
        elif c.input_type == "raw" and c.encoder_type == "whisper":
            from espnet_tpu.models.ssl import whisper_log_mel

            feats, feat_lengths = whisper_log_mel(
                speech, speech_lengths, c.fs, self._whisper_cfg.n_mels
            )
        elif c.input_type == "raw":
            feats, feat_lengths = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
                c.win_length, c.n_mels, precision=c.frontend_precision,
            )
        elif c.input_type == "sinc":
            feats, feat_lengths = self.sinc_frontend(
                speech, speech_lengths, deterministic
            )
        elif c.input_type == "sliding_window":
            # raw-sample frames as features
            # (`espnet2/asr/frontend/windowing.py` SlidingWindow)
            from espnet_tpu.ops.stft import frame_signal

            win = c.win_length or 400
            feats = frame_signal(speech, win, c.hop_length, center=True)
            feat_lengths = jnp.minimum(
                speech_lengths // c.hop_length + 1, feats.shape[1]
            )
        elif c.input_type == "fused":
            # two spectral resolutions on the same hop grid, concatenated
            # (`espnet2/asr/frontend/fused.py` FusedFrontends)
            n_fft2 = c.fused_n_fft2 or 2 * c.n_fft
            f1, feat_lengths = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
                c.win_length, c.n_mels,
            )
            f2, _ = log_mel_spectrogram(
                speech, speech_lengths, c.fs, n_fft2, c.hop_length,
                None, c.n_mels,
            )
            t = min(f1.shape[1], f2.shape[1])
            feats = jnp.concatenate([f1[:, :t], f2[:, :t]], axis=-1)
            feat_lengths = jnp.minimum(feat_lengths, t)
        else:
            feats, feat_lengths = speech, speech_lengths
        if c.use_specaug and not deterministic:
            key = self.make_rng("specaug")
            feats = specaug(
                key, feats, feat_lengths,
                num_freq_masks=c.num_freq_masks,
                freq_mask_width=c.freq_mask_width,
                num_time_masks=c.num_time_masks,
                time_mask_width=c.time_mask_width,
            )
        if c.normalize == "global_mvn":
            feats = self.mvn(feats, feat_lengths)
        elif c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, feat_lengths)
        return feats, feat_lengths

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        """Frontend + encoder (`espnet_model.py:351`), used by inference."""
        feats, feat_lengths = self._frontend(speech, speech_lengths, deterministic)
        out = self.encoder(feats, feat_lengths, deterministic)
        return out[0], out[1]  # drop InterCTC intermediates if any

    def encode_chunk(self, speech, speech_lengths, carry):
        """Chunk-streaming encode for the v1 window/segment wrappers
        (`espnet/nets/pytorch_backend/streaming/{window,segment}.py`):
        frontend + unidirectional RNN encoder resuming from `carry`.
        Returns (enc, enc_lengths, new_carry)."""
        if self.config.encoder_type != "vgg_lstm":
            raise ValueError("encode_chunk needs encoder_type=vgg_lstm")
        feats, feat_lengths = self._frontend(speech, speech_lengths, True)
        return self.encoder(feats, feat_lengths, True, carry=carry,
                            return_carry=True)

    def encoder_carry(self, batch: int):
        return self.encoder.init_carry(batch)

    def encode_with_intermediates(self, speech, speech_lengths,
                                  deterministic: bool = True):
        feats, feat_lengths = self._frontend(
            speech, speech_lengths, deterministic
        )
        out = self.encoder(feats, feat_lengths, deterministic)
        if len(out) == 3:
            return out
        return out[0], out[1], []

    def ctc_log_probs(self, encoder_out):
        return jax.nn.log_softmax(
            self.ctc_head(encoder_out).astype(jnp.float32), axis=-1
        )

    def decoder_score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        return self.decoder.score_step(tokens_step, pos, memory, memory_lengths, cache)

    def decoder_init_cache(self, batch, max_len, memory=None,
                           memory_lengths=None):
        if self.config.decoder_type == "rnn":
            return self.decoder.score_memory_cache(
                batch, memory, memory_lengths
            )
        return self.decoder.init_cache(batch, max_len)

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self.config
        enc, enc_lengths, inters = self.encode_with_intermediates(
            speech, speech_lengths, deterministic
        )
        stats: Dict[str, jnp.ndarray] = {}
        loss_ctc = 0.0
        loss_att = 0.0
        if c.ctc_weight > 0.0:
            ctc_logits = self.ctc_head(enc)
            loss_ctc = ctc_loss(
                ctc_logits, text, enc_lengths, text_lengths, c.blank_id
            )
            stats["loss_ctc"] = loss_ctc
            if inters and c.interctc_weight > 0.0:
                # aux CTC on intermediate encoder layers, same CTC head
                # (`espnet_model.py:244-286`)
                loss_inter = 0.0
                for idx, h in inters:
                    li = ctc_loss(
                        self.ctc_head(h), text, enc_lengths, text_lengths,
                        c.blank_id,
                    )
                    stats[f"loss_interctc_layer{idx}"] = li
                    loss_inter = loss_inter + li
                loss_inter = loss_inter / len(inters)
                loss_ctc = (
                    (1.0 - c.interctc_weight) * loss_ctc
                    + c.interctc_weight * loss_inter
                )
                stats["loss_interctc"] = loss_inter
            # diagnostic: fraction of utterances whose encoder output is too
            # short for any CTC alignment (zero_infinity silently zeroes
            # them — a high value means the data/subsampling config is bad)
            repeats = jnp.sum(
                (text[:, 1:] == text[:, :-1])
                & (jnp.arange(1, text.shape[1])[None] < text_lengths[:, None]),
                axis=1,
            )
            infeasible = enc_lengths < (text_lengths + repeats)
            stats["ctc_infeasible"] = jnp.mean(infeasible.astype(jnp.float32))
        if c.ctc_weight < 1.0:
            ys_in, ys_out, ys_lengths = add_sos_eos(
                text, text_lengths, c.sos_id, c.eos_id
            )
            logits = self.decoder(
                ys_in, ys_lengths, enc, enc_lengths, deterministic
            )
            valid = make_valid_mask(ys_lengths, ys_in.shape[1])
            loss_att = label_smoothing_loss(logits, ys_out, valid, c.lsm_weight)
            stats["loss_att"] = loss_att
            stats["acc"] = token_accuracy(logits, ys_out, valid)
        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats
