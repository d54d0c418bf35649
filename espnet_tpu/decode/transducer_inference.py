"""Speech2TextTransducer: batched transducer inference (greedy or beam).

Behavioral spec: reference `espnet2/bin/asr_transducer_inference.py`
(Speech2Text for the transducer task: encode once, run
BeamSearchTransducer, ids -> tokens -> text). The TPU version jits one
program per shape bucket and decodes whole batches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.asr_inference import DecodeResult
from espnet_tpu.models.transducer import TransducerASRModel


class Speech2TextTransducer:
    def __init__(
        self,
        model: TransducerASRModel,
        params,
        extra_vars: Optional[Dict] = None,
        tokenizer=None,
        converter=None,
        beam_size: int = 5,
        max_expansions: int = 3,
        max_tokens: int = 256,
        score_norm: bool = True,
        search: str = "maes",   # maes | nsc | tsd | alsd | greedy
    ):
        self.model = model
        self.variables = {"params": params, **(extra_vars or {})}
        self.tokenizer = tokenizer
        self.converter = converter
        self.beam_size = beam_size
        self.max_expansions = max_expansions
        self.max_tokens = max_tokens
        self.score_norm = score_norm
        self.search = "greedy" if beam_size <= 1 else search
        self._decode_jit = jax.jit(self._decode_batch)

    def _decode_batch(self, speech, speech_lengths):
        model = self.model
        enc, elen = model.apply(
            self.variables, speech, speech_lengths,
            method=TransducerASRModel.encode,
        )
        if self.search == "greedy":
            toks, lens = model.apply(
                self.variables, enc, elen, self.max_tokens,
                method=TransducerASRModel.greedy_search,
            )
            return toks, lens, jnp.zeros((enc.shape[0],), jnp.float32)
        if self.search == "alsd":
            return model.apply(
                self.variables, enc, elen, self.beam_size, self.max_tokens,
                50, self.score_norm,
                method=TransducerASRModel.alsd_search,
            )
        if self.search == "tsd":
            return model.apply(
                self.variables, enc, elen, self.beam_size,
                self.max_expansions, self.max_tokens, self.score_norm,
                method=TransducerASRModel.tsd_search,
            )
        if self.search == "nsc":
            # real N-step constrained search: per-frame prefix merge +
            # subtract-dedup'd constrained expansions, numpy-oracle-parity
            # tested (`beam_search_transducer.py:547` nsc_beam_search)
            return model.apply(
                self.variables, enc, elen, self.beam_size,
                self.max_expansions, self.max_tokens, self.score_norm,
                method=TransducerASRModel.nsc_search,
            )
        # "maes": the fixed-shape expansion program with a constant
        # expansion width (the reference's adaptive gamma-pruning of the
        # per-step candidate set is replaced by the static top-W cut).
        return model.apply(
            self.variables, enc, elen, self.beam_size, self.max_expansions,
            self.max_tokens, self.score_norm,
            method=TransducerASRModel.beam_search,
        )

    def __call__(
        self,
        speech: np.ndarray,
        speech_lengths: np.ndarray,
        keys: Optional[Sequence[str]] = None,
    ) -> List[DecodeResult]:
        toks, lens, scores = self._decode_jit(
            jnp.asarray(speech), jnp.asarray(speech_lengths)
        )
        toks, lens, scores = map(np.asarray, (toks, lens, scores))
        results = []
        for bi in range(toks.shape[0]):
            ids = toks[bi, : int(lens[bi])].tolist()
            tokens = self.converter.ids2tokens(ids) if self.converter else []
            text = self.tokenizer.tokens2text(tokens) if self.tokenizer else ""
            results.append(
                DecodeResult(
                    key=keys[bi] if keys else str(bi),
                    token_ids=ids, tokens=tokens, text=text,
                    score=float(scores[bi]),
                    nbest=[(ids, float(scores[bi]))],
                )
            )
        return results
