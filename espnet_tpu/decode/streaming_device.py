"""Device-resident streaming ASR (the TPU-native streaming decode path).

Behavioral spec: reference `espnet2/bin/asr_inference_streaming.py:37`
(Speech2TextStreaming: incremental `apply_frontend:203` + contextual-block
encoder `forward_infer`, hypotheses extended block-synchronously). The
reference keeps every rolling buffer on the host because torch eager makes
that free; over a remote-dispatch link it is the whole cost: the round-4
build re-uploaded the full sample history (recompiling per growing shape),
the (1, t_max, D) encoder buffer and the (1, t_max, V) CTC buffer every
chunk, and pulled encoder frames back per block — streaming RTF 3.08
(PROFILE.md r4 table).

This rebuild keeps ALL rolling state on the device as a fixed-shape pytree
(sample tail, feature tail, subsampled-frame ring, per-layer context
vectors, CTC/encoder buffers, beam state), advanced by ONE donated jitted
step per fixed audio quantum:

    quantum = subsample_factor * stream_hop_size feature frames of audio
            = exactly one encoder-block hop (0.512 s at the default
              40/16/16 geometry, hop 128 @ 16 kHz)

Each steady-state step runs: frontend over the NEW samples only (the
carried sample tail supplies STFT context; static shapes, compiled once),
conv-subsampling of the new frames (carrying the 3-frame conv overlap),
a roll into the subsampled-frame ring, and — when a block boundary is
crossed, which the host knows statically from the sample count — one
contextual block whose finalized frames flow through after_norm + the CTC
head into device-resident buffers and on into the search, all inside the
same dispatch. Host traffic per step: the audio chunk up (unavoidable)
and the incremental hypothesis down (tiny). Nothing else moves; nothing
recompiles.

Greedy (`search="greedy"`) reproduces offline CTC greedy exactly; beam
(`search="beam"`) drives `decode/online_beam_search.process_block` on the
same device buffers (reference
`espnet/nets/batch_beam_search_online.py:179` semantics). Short
utterances (<= one block) fall back to the offline short-sequence path,
matching `models/streaming.py` `__call__`'s short branch.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.embedding import sinusoidal_table
from espnet_tpu.ops.masks import attention_bias

_FAR = 1 << 30  # "no utterance end in sight" sentinel for t_total


def _subsampled_count(nf: int) -> int:
    """# fully-determined subsampled frames from nf feature frames
    (two VALID k=3 s=2 convs, `models/subsampling.py`)."""
    return max(0, ((nf - 1) // 2 - 1) // 2)


class DeviceStreamingRecognizer:
    """Fixed-shape, device-resident streaming recognizer.

    Result-dict compatible with `Speech2TextStreaming.__call__`; accepts
    arbitrary chunk sizes — internally audio advances in fixed quanta.
    """

    def __init__(
        self,
        model: ASRModel,
        params,
        extra_vars: Optional[dict] = None,
        tokenizer=None,
        converter=None,
        search: str = "greedy",
        beam_size: int = 10,
        ctc_weight: float = 0.3,
        penalty: float = 0.0,
        max_steps: int = 64,
        t_max: int = 512,
    ):
        cfg = model.config
        if cfg.encoder_type != "contextual_block_conformer":
            raise ValueError(
                "streaming inference needs encoder_type="
                "contextual_block_conformer")
        if cfg.normalize == "utterance_mvn":
            raise ValueError(
                "utterance_mvn is non-causal; use global_mvn or none for "
                "streaming")
        if cfg.subsampling_factor != 4:
            raise ValueError("device streaming supports subsampling 4")
        if (cfg.n_fft // 2) % cfg.hop_length != 0:
            raise ValueError("n_fft/2 must be a hop multiple")
        if cfg.use_specaug is True and cfg.input_type != "raw":
            pass
        self.model = model
        self.variables = {"params": params, **(extra_vars or {})}
        self.tokenizer = tokenizer
        self.converter = converter
        self.search = search
        self.max_steps = max_steps
        self.t_max = t_max

        self.hop = cfg.hop_length
        self.n_fft = cfg.n_fft
        self.bs = cfg.block_size
        self.hb = cfg.stream_hop_size
        self.la = cfg.look_ahead
        self.d = cfg.d_model
        self.P = self.n_fft // (2 * self.hop)     # center pad, in hops
        self.F = 4 * self.hb                      # feature frames / quantum
        self.Q = self.F * self.hop                # samples / quantum
        # stable frames after m quanta: m*F - P + 1; the first step emits
        # F1 = F - P + 1 frames, steady steps F. Frame f starts at sample
        # f*hop - n_fft/2, so the carried sample tail is (2P-1) hops.
        self.F1 = self.F - self.P + 1
        self.TAIL = (2 * self.P - 1) * self.hop
        # conv overlap: features [4*s_avail, nf) must be re-fed to the
        # subsampling convs; nf mod 4 is constant across steady steps, so
        # the overlap is a constant of the geometry
        nf1 = self.F1
        self.OV = nf1 - 4 * _subsampled_count(nf1)
        self.XBUF = max(128, 2 * self.bs + 2 * self.hb)  # frame ring size
        self.ZPAD = self.bs + self.hb             # zero slots past the ring
        # emit window: slots [start, start+count) of the (bs+2)-slot block;
        # start=1/count=bs-la for block 0, start=lo/count=hb steady,
        # start=lo/count<=bs+2-lo for the last block (encoder.py:357)
        self.lo = self.bs - self.la - self.hb + 1
        self.EMIT_W = max(self.bs - self.la, self.hb,
                          self.bs + 2 - self.lo) + 1
        self.smax = max(2 * t_max, 1024)
        self._pe_np = np.asarray(sinusoidal_table(self.smax, self.d))
        self._sqrt_d = float(self.d) ** 0.5

        if search == "beam":
            from espnet_tpu.decode.beam_search import BeamSearchConfig

            self.bs_cfg = BeamSearchConfig(
                beam_size=beam_size,
                att_weight=1.0 - ctc_weight,
                ctc_weight=ctc_weight,
                penalty=penalty,
                maxlenratio=0.0,
            )
        self._jit_cache: Dict[Any, Any] = {}
        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        c = self.model.config
        d, m = self.d, c.n_mels
        L = c.num_encoder_layers
        z32 = np.float32
        self._pending = np.zeros((0,), z32)
        self._chunks: List[np.ndarray] = []  # host copy for the short path
        self._nsteps = 0            # quanta consumed
        self._nf = 0                # stable feature frames so far
        self._n_samples = 0
        self._enc_committed = 0     # frames written into enc/lp buffers
        self._next_block = 0
        self._prev_tok = c.blank_id
        self._ids: List[int] = []
        self._finalized = False
        self._dev = {
            "stail": jnp.zeros((1, self.TAIL), z32),
            "ftail": jnp.zeros((1, self.OV, m), z32),
            "xbuf": jnp.zeros((1, self.XBUF, d), z32),
            "ctx": jnp.zeros((L, 1, d), z32),
            "prev_addin": jnp.zeros((1, d), z32),
        }
        if self.search == "beam":
            from espnet_tpu.decode.online_beam_search import init_online_state

            self._dev["enc_buf"] = jnp.zeros(
                (1, self.t_max + self.EMIT_W, d), z32)
            self._dev["lp_buf"] = jnp.zeros(
                (1, self.t_max + self.EMIT_W, c.vocab_size), z32)
            w = self.bs_cfg.beam_size
            att_cache = self.model.apply(
                self.variables, w, self.max_steps + 1,
                jnp.zeros((w, self.t_max + self.EMIT_W, d), z32),
                jnp.asarray([0] * w, np.int32),
                method=type(self.model).decoder_init_cache,
            )
            self._dev["beam"] = init_online_state(
                self.bs_cfg, c.sos_id, c.eos_id, 1,
                self.t_max + self.EMIT_W, self.max_steps, att_cache,
                vocab_size=c.vocab_size,
            )

    # ------------------------------------------------------------------
    # traced helpers (called inside the jitted step)
    # ------------------------------------------------------------------
    def _mel_of_frames(self, frames):
        """(1, nf, n_fft) sample frames -> (1, nf, n_mels) normalized."""
        from espnet_tpu.ops.stft import (
            _dft_bases, _padded_window, log_mel, power_spectrum)

        c = self.model.config
        w = jnp.asarray(_padded_window(c.win_length or self.n_fft,
                                       self.n_fft, "hann"))
        fr = frames * w[None, None, :]
        cos_b, sin_b = _dft_bases(self.n_fft)
        prec = c.frontend_precision
        real = jnp.einsum("bfn,nk->bfk", fr, jnp.asarray(cos_b),
                          precision=prec)
        imag = jnp.einsum("bfn,nk->bfk", fr, jnp.asarray(sin_b),
                          precision=prec)
        feats = log_mel(power_spectrum(real, imag), c.fs, self.n_fft,
                        c.n_mels, precision=prec)
        if c.normalize == "global_mvn":
            nf = feats.shape[1]
            feats = self.model.apply(
                self.variables, feats, jnp.full((1,), nf, jnp.int32),
                method=lambda mod, f, l: mod.mvn(f, l))
        return feats

    def _frames_of_window(self, window, n_frames: int):
        idx = (np.arange(n_frames, dtype=np.int32)[:, None] * self.hop
               + np.arange(self.n_fft, dtype=np.int32)[None, :])
        return window[:, idx]

    def _embed_window(self, feats):
        """Conv-subsample a feature window (1, nf, m) -> (1, ns, d)."""
        nf = feats.shape[1]
        return self.model.apply(
            self.variables, feats, jnp.full((1,), nf, jnp.int32),
            method=lambda mod, f, l: mod.encoder.embed(f, l))[0]

    def _roll_in(self, xbuf, new, count):
        """Roll `count` (dynamic, <= new.shape[1]) leading frames of `new`
        into the right end of the ring."""
        smax = new.shape[1]
        xbuf = jnp.roll(xbuf, -count, axis=1)
        pad = jnp.zeros((1, self.XBUF, self.d), xbuf.dtype)
        pad = jax.lax.dynamic_update_slice(
            pad, new.astype(xbuf.dtype), (0, self.XBUF - smax, 0))
        pad = jnp.roll(pad, smax - count, axis=1)
        pos = jnp.arange(self.XBUF)[None, :, None]
        return jnp.where(pos >= self.XBUF - count, pad, xbuf)

    def _chunk_bias_const(self):
        bs = self.bs
        q = np.arange(bs + 2)[:, None]
        k = np.arange(bs + 2)[None, :]
        mask = (q >= 1) & (k <= bs)
        return attention_bias(jnp.asarray(mask)[None, None])

    def _block_body(self, dev, bi, s_avail, t_total, first, emit_start,
                    emit_count):
        """Run contextual block `bi` from the frame ring. Returns
        (dev', emit (1, EMIT_W, d) after_norm'ed + masked)."""
        bs, d = self.bs, self.d
        ring = jnp.concatenate(
            [dev["xbuf"], jnp.zeros((1, self.ZPAD, d), dev["xbuf"].dtype)],
            axis=1)
        start = bi * self.hb
        rel = self.XBUF - (s_avail - start)
        frames = jax.lax.dynamic_slice(ring, (0, rel, 0), (1, bs, d))
        count = jnp.clip(t_total - start, 1, bs)
        pe = jnp.asarray(self._pe_np)
        bias = self._chunk_bias_const()
        sqrt_d = self._sqrt_d

        def body(mod, frames, ctx, prev_addin):
            e = mod.encoder
            if e.init_average:
                addin_cur = jnp.sum(frames, axis=1) / count.astype(
                    frames.dtype)
            else:
                addin_cur = jnp.max(frames, axis=1)
            if e.ctx_pos_enc:
                addin_cur = (addin_cur * sqrt_d
                             + jax.lax.dynamic_slice(
                                 pe, (bi, 0), (1, d)).astype(addin_cur.dtype))
            frames_pe = (frames * sqrt_d
                         + jax.lax.dynamic_slice(
                             pe, (start, 0), (bs, d))[None].astype(
                                 frames.dtype))
            slot0 = jnp.where(first, addin_cur, prev_addin)
            h = jnp.concatenate(
                [slot0[:, None], frames_pe, addin_cur[:, None]], axis=1)
            new_ctx = []
            for li, layer in enumerate(e.layers):
                if li > 0:
                    chain = h[:, -1]
                    use = jnp.where(first, chain, ctx[li])
                    h = h.at[:, 0].set(use)
                    new_ctx.append(chain)
                else:
                    new_ctx.append(addin_cur)
                h = layer(h, bias, True)
            # pad before slicing: dynamic_slice CLAMPS out-of-range starts,
            # which would silently shift the emit window
            h_pad = jnp.pad(h, ((0, 0), (0, self.EMIT_W), (0, 0)))
            emit = jax.lax.dynamic_slice(
                h_pad, (0, emit_start, 0), (1, self.EMIT_W, d))
            emit = e.after_norm(emit)
            return emit, jnp.stack(new_ctx, axis=0), addin_cur

        emit, new_ctx, addin_cur = self.model.apply(
            self.variables, frames, dev["ctx"], dev["prev_addin"],
            method=body)
        dev = dict(dev)
        dev["ctx"] = new_ctx
        dev["prev_addin"] = addin_cur
        emask = (jnp.arange(self.EMIT_W)[None, :, None] < emit_count)
        emit = jnp.where(emask, emit, 0.0)
        return dev, emit

    def _search_update(self, dev, out, emit, emit_count, old_len,
                       is_final_block):
        """CTC head on the emitted frames; advance greedy or beam state."""
        c = self.model.config
        lp = self.model.apply(self.variables, emit,
                              method=ASRModel.ctc_log_probs)
        if self.search == "beam":
            from espnet_tpu.decode.online_beam_search import process_block

            dev["enc_buf"] = jax.lax.dynamic_update_slice(
                dev["enc_buf"], emit.astype(dev["enc_buf"].dtype),
                (0, old_len, 0))
            dev["lp_buf"] = jax.lax.dynamic_update_slice(
                dev["lp_buf"], lp.astype(dev["lp_buf"].dtype),
                (0, old_len, 0))
            new_len = jnp.minimum(old_len + emit_count, self.t_max)
            w = self.bs_cfg.beam_size
            mem = jnp.repeat(dev["enc_buf"], w, axis=0)
            mem_lens = jnp.full((w,), new_len, jnp.int32)

            def att_score_fn(tokens, pos, cache):
                return self.model.apply(
                    self.variables, tokens, pos, mem, mem_lens, cache,
                    method=type(self.model).decoder_score_step)

            beam, yseq, ylen, score = process_block(
                self.bs_cfg, c.sos_id, c.eos_id, c.vocab_size,
                dev["beam"], dev["lp_buf"],
                jnp.full((1,), old_len, jnp.int32),
                jnp.full((1,), new_len, jnp.int32),
                att_score_fn, is_final=is_final_block,
                max_steps=self.max_steps,
            )
            dev["beam"] = beam
            out["yseq"], out["ylen"] = yseq, ylen
        else:
            out["toks"] = jnp.argmax(lp[0], axis=-1)
            out["emit_count"] = emit_count
        return dev, out

    # ------------------------------------------------------------------
    def _make_step(self, kind: str, do_block: bool, is_final_block: bool):
        """Build one compiled step. kind: "first" | "steady" | "flush" |
        "block_only"."""
        c = self.model.config

        def feature_part(dev, chunk, r_valid):
            """Returns (dev', new_x (1, <=16, d), count_s)."""
            if kind == "first":
                # frames [0, F1): left reflect pad n_fft/2
                window = jnp.pad(chunk, ((0, 0), (self.n_fft // 2, 0)),
                                 mode="reflect")
                frames = self._frames_of_window(window, self.F1)
                feats = self._mel_of_frames(frames)
                conv_in = feats
                count_s = jnp.asarray(_subsampled_count(self.F1), jnp.int32)
                dev["stail"] = chunk[:, -self.TAIL:]
                dev["ftail"] = conv_in[:, -self.OV:]
            elif kind == "steady":
                window = jnp.concatenate([dev["stail"], chunk], axis=1)
                frames = self._frames_of_window(window, self.F)
                feats = self._mel_of_frames(frames)
                conv_in = jnp.concatenate([dev["ftail"], feats], axis=1)
                count_s = jnp.asarray(self.hb, jnp.int32)
                dev["stail"] = window[:, -self.TAIL:]
                dev["ftail"] = conv_in[:, -self.OV:]
            else:  # flush
                slots = self.F + self.P
                window = jnp.concatenate(
                    [dev["stail"], chunk,
                     jnp.zeros((1, (self.P + 2) * self.hop, ), chunk.dtype)],
                    axis=1)
                L = self.TAIL + r_valid
                idx = (np.arange(slots, dtype=np.int32)[:, None] * self.hop
                       + np.arange(self.n_fft, dtype=np.int32)[None, :])
                idx = jnp.asarray(idx)
                # right reflect pad at the (dynamic) utterance end
                idx = jnp.where(idx >= L, 2 * L - 2 - idx, idx)
                idx = jnp.clip(idx, 0, window.shape[1] - 1)
                frames = window[0][idx][None]
                feats = self._mel_of_frames(frames)
                cf = r_valid // self.hop + self.P  # valid frames this flush
                fmask = (jnp.arange(slots)[None, :, None] < cf)
                feats = jnp.where(fmask, feats, 0.0)
                conv_in = jnp.concatenate([dev["ftail"], feats], axis=1)
                count_s = jnp.maximum((self.OV + cf - 3) // 4, 0)
            new_x = self._embed_window(conv_in)
            return dev, new_x, count_s

        if kind == "block_only":

            def step(dev, bi, s_avail, t_total, first_flag, emit_start,
                     emit_count, old_len):
                dev = dict(dev)
                out: Dict[str, Any] = {}
                dev, emit = self._block_body(
                    dev, bi, s_avail, t_total, first_flag, emit_start,
                    emit_count)
                dev, out = self._search_update(
                    dev, out, emit, emit_count, old_len, is_final_block)
                return dev, out

            return jax.jit(step)

        def step(dev, chunk, r_valid, bi, s_avail, t_total, first_flag,
                 emit_start, emit_count, old_len):
            dev = dict(dev)
            out: Dict[str, Any] = {}
            dev, new_x, count_s = feature_part(dev, chunk, r_valid)
            dev["xbuf"] = self._roll_in(dev["xbuf"], new_x, count_s)
            s_new = s_avail + count_s
            if do_block:
                dev, emit = self._block_body(
                    dev, bi, s_new, t_total, first_flag, emit_start,
                    emit_count)
                dev, out = self._search_update(
                    dev, out, emit, emit_count, old_len, is_final_block)
            return dev, out

        return jax.jit(step)

    def _step_fn(self, kind, do_block, is_final_block):
        key = (kind, do_block, is_final_block)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._make_step(
                kind, do_block, is_final_block)
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def _consume(self, out):
        c = self.model.config
        if self.search == "beam":
            if "yseq" in out:
                n_best = int(np.asarray(out["ylen"])[0, 0])
                self._ids = [
                    int(t) for t in np.asarray(out["yseq"])[0, 0, :n_best]]
        elif "toks" in out:
            toks = np.asarray(out["toks"])
            n = int(np.asarray(out["emit_count"]))
            for t in toks[:n]:
                t = int(t)
                if t != c.blank_id and t != self._prev_tok:
                    self._ids.append(t)
                self._prev_tok = t

    def _emit_params(self, bi: int, nblk: Optional[int], t_total_s: int):
        """(emit_start, emit_count) for block bi (encoder.py:357 slots)."""
        if bi == 0:
            start, count = 1, self.bs - self.la
        else:
            start, count = self.lo, self.hb
        if nblk is not None and bi == nblk - 1:
            hi = t_total_s - bi * self.hb + 1
            count = hi - start
        return start, max(0, min(count, self.EMIT_W))

    def _advance(self, chunk_np: np.ndarray, kind: str, r_valid: int,
                 t_total_s: Optional[int], nblk: Optional[int]):
        """Run one device step; the host decides the block schedule (it is
        a pure function of the sample count)."""
        s_old = _subsampled_count(self._nf)
        if kind == "first":
            nf_new = self._nf + self.F1
        elif kind == "steady":
            nf_new = self._nf + self.F
        else:
            nf_new = self._nf + r_valid // self.hop + self.P
        s_new = _subsampled_count(nf_new)
        bi = self._next_block
        if nblk is None:
            ready = bi * self.hb + self.bs <= s_new
        else:
            ready = bi < nblk
        emit_start, emit_count = (
            self._emit_params(bi, nblk, t_total_s) if ready else (0, 0))
        is_final_block = nblk is not None and bi == nblk - 1 and ready
        fn = self._step_fn(kind, bool(ready), is_final_block)
        dev, out = fn(
            self._dev, jnp.asarray(chunk_np[None]),
            jnp.asarray(r_valid, jnp.int32),
            jnp.asarray(bi, jnp.int32),
            jnp.asarray(s_old, jnp.int32),
            jnp.asarray(t_total_s if t_total_s is not None else _FAR,
                        jnp.int32),
            jnp.asarray(bi == 0),
            jnp.asarray(emit_start, jnp.int32),
            jnp.asarray(emit_count, jnp.int32),
            jnp.asarray(self._enc_committed, jnp.int32),
        )
        self._dev = dev
        self._nf = nf_new
        if ready:
            self._next_block = bi + 1
            self._enc_committed = min(self._enc_committed + emit_count,
                                      self.t_max)
            self._consume(out)

    def _advance_block_only(self, t_total_s: int, nblk: int):
        """Process one outstanding block with no new audio (final flush)."""
        bi = self._next_block
        emit_start, emit_count = self._emit_params(bi, nblk, t_total_s)
        fn = self._step_fn("block_only", True, bi == nblk - 1)
        s_avail = _subsampled_count(self._nf)
        dev, out = fn(
            self._dev,
            jnp.asarray(bi, jnp.int32),
            jnp.asarray(s_avail, jnp.int32),
            jnp.asarray(t_total_s, jnp.int32),
            jnp.asarray(bi == 0),
            jnp.asarray(emit_start, jnp.int32),
            jnp.asarray(emit_count, jnp.int32),
            jnp.asarray(self._enc_committed, jnp.int32),
        )
        self._dev = dev
        self._next_block = bi + 1
        self._enc_committed = min(self._enc_committed + emit_count,
                                  self.t_max)
        self._consume(out)

    # ------------------------------------------------------------------
    def _offline_final(self, n: int, t_s: int):
        """Short-utterance fallback: one offline encode of the retained
        signal (models/streaming.py short-sequence branch)."""
        c = self.model.config
        sig = (np.concatenate(self._chunks) if self._chunks
               else np.zeros((0,), np.float32))
        sig = sig[:n]
        enc, _ = self.model.apply(
            self.variables, jnp.asarray(sig[None]),
            jnp.asarray([n], np.int32), method=ASRModel.encode)
        enc = enc[:, :t_s]
        if self.search == "beam":
            from espnet_tpu.decode.beam_search import batched_beam_search

            w = self.bs_cfg.beam_size
            lp = self.model.apply(self.variables, enc,
                                  method=ASRModel.ctc_log_probs)
            mem = jnp.repeat(enc, w, axis=0)
            mem_lens = jnp.full((w,), t_s, jnp.int32)
            att_cache = self.model.apply(
                self.variables, w, self.max_steps + 1, mem, mem_lens,
                method=type(self.model).decoder_init_cache)

            def att_score_fn(tokens, pos, cache):
                return self.model.apply(
                    self.variables, tokens, pos, mem, mem_lens, cache,
                    method=type(self.model).decoder_score_step)

            yseq, ylen, _ = batched_beam_search(
                self.bs_cfg, c.sos_id, c.eos_id, c.vocab_size,
                jnp.full((1,), t_s, jnp.int32), att_score_fn, att_cache,
                ctc_log_probs=lp if self.bs_cfg.ctc_weight > 0 else None,
                max_steps=self.max_steps)
            n_best = int(np.asarray(ylen)[0, 0])
            self._ids = [int(t) for t in np.asarray(yseq)[0, 0, :n_best]]
        else:
            lp = self.model.apply(self.variables, enc,
                                  method=ASRModel.ctc_log_probs)
            toks = np.asarray(jnp.argmax(lp, axis=-1))[0]
            for t in toks:
                t = int(t)
                if t != c.blank_id and t != self._prev_tok:
                    self._ids.append(t)
                self._prev_tok = t

    # ------------------------------------------------------------------
    def __call__(self, chunk: np.ndarray, is_final: bool = False):
        arr = np.asarray(chunk, np.float32).reshape(-1)
        self._pending = np.concatenate([self._pending, arr])
        self._n_samples += len(arr)
        # host copy of the raw audio, kept only while the utterance could
        # still take the short-utterance offline path; dropped as soon as
        # the utterance is definitely long
        if _subsampled_count(self._n_samples // self.hop + 1) <= self.bs:
            self._chunks.append(arr)
        else:
            self._chunks.clear()

        while len(self._pending) >= self.Q:
            q = self._pending[:self.Q]
            self._pending = self._pending[self.Q:]
            kind = "first" if self._nsteps == 0 else "steady"
            self._advance(q, kind, 0, None, None)
            self._nsteps += 1

        if is_final:
            n = self._n_samples
            t_feat = n // self.hop + 1
            t_s = ((t_feat - 1) // 2 - 1) // 2
            if self._nsteps == 0 or t_s <= self.bs:
                self._offline_final(n, t_s)
            else:
                past = self.bs - self.hb - self.la
                nblk = max(1, math.ceil(
                    float(t_s - past - self.la) / self.hb))
                r = len(self._pending)
                qpad = np.zeros(self.Q, np.float32)
                qpad[:r] = self._pending
                self._pending = np.zeros((0,), np.float32)
                self._advance(qpad, "flush", r, t_s, nblk)
                while self._next_block < nblk:
                    self._advance_block_only(t_s, nblk)

        ids = list(self._ids)
        tokens = self.converter.ids2tokens(ids) if self.converter else []
        text = self.tokenizer.tokens2text(tokens) if self.tokenizer else ""
        if is_final:
            self.reset()
        return {"token_ids": ids, "tokens": tokens, "text": text,
                "is_final": is_final}
