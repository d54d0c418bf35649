"""Multi-encoder ASR inference CLI: joint CTC/attention beam search over
the HAN-fused decoder, log-linear CTC stream fusion with --weights_ctc_dec.

Reference analogue: decoding of
`espnet/nets/pytorch_backend/e2e_asr_mulenc.py` (`recognize`, per-stream
CTC prefix scorers weighted by `--weights-ctc-dec`).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--max_steps", type=int, default=96)
    p.add_argument("--batch_size", type=int, default=4)
    return p


class Speech2TextMulEnc:
    """Batched beam search over the stacked multi-encoder memory."""

    def __init__(self, model, variables, converter, beam_size, ctc_weight,
                 max_steps):
        import jax

        from espnet_tpu.decode.beam_search import (
            BeamSearchConfig, batched_beam_search,
        )

        self.model = model
        self.variables = variables
        self.converter = converter
        cfg = model.config
        self.search_cfg = BeamSearchConfig(
            beam_size=beam_size, att_weight=1.0 - ctc_weight,
            ctc_weight=ctc_weight,
        )
        self.max_steps = max_steps

        def decode(speech, stream_lengths):
            import jax.numpy as jnp

            enc, elens = model.apply(
                variables, speech, stream_lengths,
                method=type(model).encode,
            )  # (B, E, T, D), (B, E)
            b = enc.shape[0]
            w = beam_size
            ctc_lp = model.apply(
                variables, enc, method=type(model).ctc_log_probs
            ) if ctc_weight > 0 else None
            fused_lens = jnp.min(elens, axis=1)
            mem = jnp.repeat(enc, w, axis=0)
            mem_lens = jnp.repeat(elens, w, axis=0)
            att_cache = model.apply(
                variables, b * w, max_steps + 1,
                method=type(model).decoder_init_cache,
            )

            def att_score_fn(tokens, pos, cache):
                return model.apply(
                    variables, tokens, pos, mem, mem_lens, cache,
                    method=type(model).decoder_score_step,
                )

            return batched_beam_search(
                self.search_cfg, cfg.sos_id, cfg.eos_id, cfg.vocab_size,
                fused_lens, att_score_fn, att_cache,
                ctc_log_probs=ctc_lp, max_steps=max_steps,
            )

        self._decode = jax.jit(decode)

    def __call__(self, speech, stream_lengths, keys):
        import jax.numpy as jnp

        yseq, ylen, score = self._decode(
            jnp.asarray(speech), jnp.asarray(stream_lengths)
        )
        yseq, ylen, score = map(np.asarray, (yseq, ylen, score))
        out = []
        for i, key in enumerate(keys):
            ids = yseq[i, 0, : ylen[i, 0]].tolist()
            toks = self.converter.ids2tokens(ids)
            text = "".join(toks).replace("▁", " ").strip()
            out.append((key, text, float(score[i, 0])))
        return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.dataset import ASRMulEncDataset
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.tokenizer import TokenIDConverter, build_tokenizer
    from espnet_tpu.tasks.asr_mulenc import ASRMulEncTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.utils.metrics import corpus_error_rate, sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = ASRMulEncTask.load_config(exp)
    data = cfg["data"]
    mc = cfg["model"]
    tokenizer = build_tokenizer(data.token_type, data.bpe_model or None)
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    model = ASRMulEncTask.build_model(mc, len(conv))
    n_enc = mc.num_encoders
    ds = ASRMulEncDataset(args.data_dir, tokenizer, conv, n_enc, data.fs)

    target = nn.meta.unbox(model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 4000, n_enc), jnp.float32),
        jnp.full((1, n_enc), 4000, jnp.int32),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1,), jnp.int32), True,
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    s2t = Speech2TextMulEnc(model, {"params": params}, conv,
                            args.beam_size, args.ctc_weight, args.max_steps)

    keys = list(ds.keys())
    hyps_text = {}
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        items = [ds[k] for k in chunk]
        n = max(it["speech"].shape[0] for it in items)
        buf = np.zeros((len(items), n, n_enc), np.float32)
        slens = np.zeros((len(items), n_enc), np.int32)
        for j, it in enumerate(items):
            buf[j, : it["speech"].shape[0]] = it["speech"]
            slens[j] = it["speech_stream_lengths"]
        for key, text, score in s2t(buf, slens, chunk):
            hyps_text[key] = text
        logger.info("decoded %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)

    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = {k: v.split() for k, v in read_2column_text(ref_path).items()
                if k in hyps_text}
        hyp_words = {k: v.split() for k, v in hyps_text.items()}
        report = sclite_report(refs, hyp_words)
        (out / "score_wer.txt").write_text(report + "\n")
        logger.info("WER %s", report)
    return hyps_text


if __name__ == "__main__":
    main()
