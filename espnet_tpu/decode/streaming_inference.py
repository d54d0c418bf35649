"""Speech2TextStreaming: incremental ASR over audio chunks.

Behavioral spec: reference `espnet2/bin/asr_inference_streaming.py:37`
(Speech2TextStreaming: incremental frontend `apply_frontend:203` feeding the
contextual-block encoder's `forward_infer`, hypotheses extended block-
synchronously). This build pairs the blockwise encoder execution
(`models/streaming.py:_one_block` — bit-identical to the training program)
with either

* ``search="greedy"`` — incremental CTC greedy decoding (final streaming
  hypothesis equals offline CTC greedy exactly), or
* ``search="beam"`` — the block-synchronous label-sync beam search of
  `decode/online_beam_search.py` (reference
  `espnet/nets/batch_beam_search_online.py:179`): per emitted encoder
  chunk, search steps are committed conservatively (rewind on
  eos/repetition) and the final chunk runs the full offline search from
  the committed state.

Only *stable* STFT frames (whose window cannot be changed by future
samples) are consumed before `is_final`.

Note: every chunk size change triggers an XLA recompile of the frontend
step; production streaming should feed fixed-size chunks.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel


class Speech2TextStreaming:
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
                "contextual_block_conformer"
            )
        if cfg.normalize == "utterance_mvn":
            raise ValueError(
                "utterance_mvn is non-causal; use global_mvn or none for "
                "streaming"
            )
        self.model = model
        self.variables = {"params": params, **(extra_vars or {})}
        self.tokenizer = tokenizer
        self.converter = converter
        self.search = search
        self.max_steps = max_steps
        self.t_max = t_max
        if search == "beam":
            from espnet_tpu.decode.beam_search import BeamSearchConfig

            self.bs_cfg = BeamSearchConfig(
                beam_size=beam_size,
                att_weight=1.0 - ctc_weight,
                ctc_weight=ctc_weight,
                penalty=penalty,
                maxlenratio=0.0,
            )
            self._beam_step_jit = {}
        self.reset()

    def reset(self):
        self._samples = np.zeros((0,), np.float32)
        self._ctx: Optional[List[Any]] = None
        self._prev_addin = None
        self._next_block = 0
        self._prev_tok = self.model.config.blank_id
        self._ids: List[int] = []
        self._beam_state = None
        self._enc_buf = None
        self._lp_buf = None
        self._enc_len = 0
        self._beam_finalized = False

    # --- model subroutines (each a jittable apply) -------------------------
    def _features(self, samples: np.ndarray, stable_only: bool):
        """Raw samples -> subsampled encoder-input frames (1, S, D)."""
        c = self.model.config
        n = len(samples)
        if stable_only:
            # frame i spans samples [i*hop - n_fft/2, i*hop + n_fft/2)
            n_frames = max(0, (n - c.n_fft // 2) // c.hop_length + 1)
        else:
            n_frames = n // c.hop_length + 1
        if n_frames <= 0:
            return None
        speech = jnp.asarray(samples[None])
        lens = jnp.asarray([n], np.int32)
        feats, flens = self.model.apply(
            self.variables, speech, lens, True,
            method=lambda m, s, l, d: m._frontend(s, l, d),
        )
        feats = feats[:, :n_frames]
        x, _ = self.model.apply(
            self.variables, feats, jnp.asarray([n_frames], np.int32),
            method=lambda m, f, l: m.encoder.embed(f, l),
        )
        return x  # (1, S, D)

    def _run_block(self, x, bi: int, t_total: int):
        """Run encoder block bi over subsampled frames x (1, S, D)."""
        enc = self.model.config
        m = self.model
        bs = enc.block_size
        hop = enc.stream_hop_size
        start = bi * hop
        count = min(t_total - start, bs) if t_total else bs
        frames = x[:, start:start + bs]
        if frames.shape[1] < bs:
            frames = jnp.pad(frames, ((0, 0), (0, bs - frames.shape[1]), (0, 0)))

        prev_addin, ctx = self._prev_addin, self._ctx

        def block_fn(mod, frames):
            e = mod.encoder
            addin_cur = (
                jnp.sum(frames[:, :count], axis=1) / max(count, 1)
                if e.init_average else jnp.max(frames[:, :count], axis=1)
            )
            if e.ctx_pos_enc:
                addin_cur = e._pos_enc(addin_cur[:, None], start=bi)[:, 0]
            frames_pe = e._pos_enc(frames, start=start)
            chunk, new_ctx = e._one_block(
                frames_pe, addin_cur, prev_addin, ctx, e._chunk_bias(), True,
            )
            return chunk, new_ctx, addin_cur

        chunk, new_ctx, addin_cur = m.apply(
            self.variables, frames, method=block_fn
        )
        return chunk, new_ctx, addin_cur

    def _emit(self, chunk, bi: int, nblk: Optional[int], t_total: int):
        """Slots of block bi that become final output frames."""
        c = self.model.config
        bs, hop, la = c.block_size, c.stream_hop_size, c.look_ahead
        first = bs - la
        if bi == 0:
            lo, hi = 1, first + 1
        else:
            lo = bs - la - hop + 1  # offset (encoder.py:357)
            hi = lo + hop
        if nblk is not None and bi == nblk - 1:
            # final block: run to the end of the utterance
            hi = t_total - bi * hop + 1
        out = chunk[:, lo:hi]
        out = self.model.apply(
            self.variables, out, method=lambda m, o: m.encoder.after_norm(o)
        )
        return out

    def _greedy_update(self, enc_frames):
        c = self.model.config
        lp = self.model.apply(
            self.variables, enc_frames, method=ASRModel.ctc_log_probs
        )
        toks = np.asarray(jnp.argmax(lp, axis=-1))[0]
        for t in toks:
            t = int(t)
            if t != c.blank_id and t != self._prev_tok:
                self._ids.append(t)
            self._prev_tok = t

    def _beam_update(self, enc_frames, is_final: bool):
        """Feed newly finalised encoder frames to the block-sync search."""
        import functools

        import jax as _jax

        from espnet_tpu.decode.online_beam_search import (
            init_online_state, process_block,
        )

        c = self.model.config
        vocab = c.vocab_size
        w = self.bs_cfg.beam_size
        if self._enc_buf is None:
            d = enc_frames.shape[-1]
            self._enc_buf = np.zeros((1, self.t_max, d), np.float32)
            self._lp_buf = np.zeros((1, self.t_max, vocab), np.float32)
        n = enc_frames.shape[1]
        old = self._enc_len
        new = min(old + n, self.t_max)
        self._enc_buf[:, old:new] = np.asarray(
            enc_frames[:, : new - old], np.float32
        )
        if self.bs_cfg.ctc_weight > 0 and new > old:
            lp = self.model.apply(
                self.variables, enc_frames[:, : new - old],
                method=ASRModel.ctc_log_probs,
            )
            self._lp_buf[:, old:new] = np.asarray(lp, np.float32)
        self._enc_len = new

        if self._beam_state is None:
            att_cache = self.model.apply(
                self.variables, w, self.max_steps + 1,
                jnp.zeros((w, self.t_max, self._enc_buf.shape[-1]),
                          np.float32),
                jnp.asarray([0] * w, np.int32),
                method=type(self.model).decoder_init_cache,
            )
            self._beam_state = init_online_state(
                self.bs_cfg, c.sos_id, c.eos_id, 1, self.t_max,
                self.max_steps, att_cache, vocab_size=vocab,
            )

        key = bool(is_final)
        if key not in self._beam_step_jit:
            model, variables = self.model, self.variables
            cfg, sos, eos = self.bs_cfg, c.sos_id, c.eos_id
            msteps = self.max_steps

            def step(state, lp_buf, enc_buf, old_len, new_len):
                mem = jnp.repeat(enc_buf, w, axis=0)
                mem_lens = jnp.repeat(new_len, w, axis=0)

                def att_score_fn(tokens, pos, cache):
                    return model.apply(
                        variables, tokens, pos, mem, mem_lens, cache,
                        method=type(model).decoder_score_step,
                    )

                return process_block(
                    cfg, sos, eos, vocab, state, lp_buf, old_len, new_len,
                    att_score_fn, is_final=key, max_steps=msteps,
                )

            self._beam_step_jit[key] = _jax.jit(step)

        state, yseq, ylen, score = self._beam_step_jit[key](
            self._beam_state, jnp.asarray(self._lp_buf),
            jnp.asarray(self._enc_buf), jnp.asarray([old], np.int32),
            jnp.asarray([new], np.int32),
        )
        self._beam_state = state
        if is_final:
            self._beam_finalized = True
        n_best = int(ylen[0, 0])
        self._ids = [int(t) for t in np.asarray(yseq[0, 0, :n_best])]

    # --- public API --------------------------------------------------------
    def __call__(self, chunk: np.ndarray, is_final: bool = False):
        c = self.model.config
        self._samples = np.concatenate(
            [self._samples, np.asarray(chunk, np.float32).reshape(-1)]
        )
        x = self._features(self._samples, stable_only=not is_final)
        if x is not None:
            s_avail = x.shape[1]
            bs, hop = c.block_size, c.stream_hop_size
            if is_final and s_avail <= bs and self._next_block == 0:
                # short utterance: offline short-sequence path (full attn,
                # encoder.py:258-268) — run the whole thing in one go
                n = len(self._samples)
                enc, _ = self.model.apply(
                    self.variables, jnp.asarray(self._samples[None]),
                    jnp.asarray([n], np.int32), method=ASRModel.encode,
                )
                if self.search == "beam":
                    self._beam_update(enc[:, :s_avail], is_final=True)
                else:
                    self._greedy_update(enc[:, :s_avail])
            else:
                if is_final:
                    import math

                    past = bs - hop - c.look_ahead
                    nblk = max(1, math.ceil(
                        float(s_avail - past - c.look_ahead) / hop))
                else:
                    nblk = None
                while True:
                    bi = self._next_block
                    if nblk is None:
                        if bi * hop + bs > s_avail:
                            break
                    elif bi >= nblk:
                        break
                    chunk_out, new_ctx, addin_cur = self._run_block(
                        x, bi, s_avail if is_final else 0
                    )
                    emit = self._emit(chunk_out, bi, nblk, s_avail)
                    final_block = nblk is not None and bi == nblk - 1
                    if self.search == "beam":
                        self._beam_update(emit, is_final=final_block)
                    else:
                        self._greedy_update(emit)
                    # context seeds for the next block
                    self._ctx = new_ctx
                    self._prev_addin = addin_cur
                    self._next_block = bi + 1
        if (
            is_final and self.search == "beam"
            and self._beam_state is not None and not self._beam_finalized
        ):
            # all blocks were consumed in earlier calls; run the final
            # offline-completion search on the committed state
            d = self._enc_buf.shape[-1]
            self._beam_update(np.zeros((1, 0, d), np.float32), is_final=True)
        ids = list(self._ids)
        tokens = self.converter.ids2tokens(ids) if self.converter else []
        text = self.tokenizer.tokens2text(tokens) if self.tokenizer else ""
        if is_final:
            self.reset()
        return {"token_ids": ids, "tokens": tokens, "text": text,
                "is_final": is_final}
