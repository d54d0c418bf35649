"""ASR inference CLI: decode a data dir with a trained experiment.

Equivalent of `python -m espnet2.bin.asr_inference` (reference
`espnet2/bin/asr_inference.py:518`) + the recipe's scoring stage
(sclite-style summary when a reference `text` exists). Usage:

    python -m espnet_tpu.bin.asr_inference \
        --exp_dir exp/asr --data_dir data/test --output_dir exp/asr/decode \
        --beam_size 10 --ctc_weight 0.3 [--params path.msgpack]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None,
                   help="params msgpack (default: best/averaged in exp_dir)")
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--search", choices=["label_sync", "timesync"],
                   default="label_sync",
                   help="label_sync = joint CTC/attention batched beam "
                        "search; timesync = frame-synchronous CTC prefix "
                        "beam search (beam_search_timesync.py)")
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--lm_weight", type=float, default=0.0)
    p.add_argument("--lm_exp_dir", default=None)
    p.add_argument("--word_lm_exp_dir", default=None,
                   help="word-level RNN LM experiment (LMTask, "
                        "token_type=word, lm_type=rnn). With --lm_exp_dir "
                        "it fuses as MultiLevelLM; alone as LookAheadWordLM "
                        "(reference asr_recog --word-rnnlm/--word-dict, "
                        "espnet/lm/pytorch_backend/extlm.py:18,117). The "
                        "fusion weight is --lm_weight.")
    p.add_argument("--subwordlm_weight", type=float, default=0.8,
                   help="MultiLevelLM within-word char-LM weight")
    p.add_argument("--oov_penalty", type=float, default=None,
                   help="extlm OOV penalty (default: per-class reference "
                        "defaults)")
    p.add_argument("--ngram_file", default=None, help="ARPA LM for fusion")
    p.add_argument("--ngram_weight", type=float, default=0.0)
    p.add_argument("--penalty", type=float, default=0.0)
    p.add_argument("--maxlenratio", type=float, default=0.0)
    p.add_argument("--minlenratio", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=0,
                   help="hard cap on decode steps (0 = encoder length)")
    p.add_argument("--nbest", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    return p


def pick_params_file(exp_dir: Path) -> Path:
    for pat in ("*.ave.params.msgpack", "valid.acc.best.params.msgpack",
                "train.loss.best.params.msgpack", "ep*.params.msgpack"):
        hits = sorted(exp_dir.glob(pat))
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no params file in {exp_dir}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import jax

    from espnet_tpu.data.dataset import EpochIterator
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables
    from espnet_tpu.utils.metrics import sclite_report, corpus_error_rate

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = ASRTask.load_config(exp)
    data = cfg["data"]
    tokenizer = ASRTask.build_tokenizer(data, exp)
    converter = ASRTask.build_token_list(data, exp, tokenizer)
    model = ASRTask.build_model(cfg["model"], len(converter))

    # target structure for deserialization, then load trained params
    ds = ASRTask.build_dataset(data, args.data_dir, tokenizer, converter,
                               train=False)
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(
        shapes, batch_size=args.batch_size,
        length_quantum=data.length_quantum, text_quantum=data.text_quantum,
    )
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2)
    batch0 = next(it.epoch(0))
    import flax.linen as nn
    import jax.numpy as jnp

    target = nn.meta.unbox(
        jax.jit(model.init, static_argnums=(5,))(
            jax.random.PRNGKey(0),
            jnp.asarray(batch0["speech"][:1]),
            jnp.asarray(batch0["speech_lengths"][:1]),
            jnp.asarray(batch0["text"][:1]),
            jnp.asarray(batch0["text_lengths"][:1]),
            True,
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    extra = {k: v for k, v in target.items() if k != "params"}
    stats_path = exp / "stats" / "feats_stats.npz"
    if model.config.normalize == "global_mvn" and stats_path.exists():
        extra["mvn"] = mvn_variables(load_stats(stats_path))

    lm_model = lm_params = None
    if args.lm_exp_dir and args.lm_weight > 0:
        from espnet_tpu.tasks.lm import LMTask

        lm_exp = Path(args.lm_exp_dir)
        lm_cfg = LMTask.load_config(lm_exp)
        train_lm = LMTask.build_model(lm_cfg["model"], len(converter))
        lm_target = nn.meta.unbox(
            train_lm.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                jnp.asarray([4]), True,
            )
        )
        full = load_pytree(pick_params_file(lm_exp), lm_target["params"])
        lm_model = LMTask.build_inference_lm(lm_cfg["model"], len(converter))
        lm_params = full["lm"]

    extra_scorers = []
    if args.word_lm_exp_dir and args.lm_weight > 0:
        from espnet_tpu.data.tokenizer import TokenIDConverter
        from espnet_tpu.decode.extlm import (
            LookAheadWordLM, MultiLevelLM, make_lexical_tree,
        )
        from espnet_tpu.decode.scorers import Scorer
        from espnet_tpu.tasks.lm import LMTask

        wexp = Path(args.word_lm_exp_dir)
        wcfg = LMTask.load_config(wexp)
        if wcfg["model"].lm_type != "rnn":
            raise ValueError(
                "--word_lm_exp_dir must be an lm_type=rnn LM: the word LM "
                "is consulted at per-hypothesis word boundaries, so its "
                "cache must be position-free (reference uses word RNNLMs, "
                "espnet/bin/asr_recog.py --word-rnnlm)")
        word_conv = TokenIDConverter.from_file(wexp / "tokens.txt")
        word_dict = {t: i for i, t in enumerate(word_conv.token_list)}
        subword_dict = {t: i for i, t in enumerate(converter.token_list)}
        word_eos = word_dict["<sos/eos>"]
        word_unk = word_dict.get("<unk>", 1)
        tree = make_lexical_tree(word_dict, subword_dict, word_unk)

        wtrain = LMTask.build_model(wcfg["model"], len(word_conv))
        wtarget = nn.meta.unbox(
            wtrain.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        jnp.asarray([4]), True))
        wfull = load_pytree(pick_params_file(wexp), wtarget["params"])
        wlm = LMTask.build_inference_lm(wcfg["model"], len(word_conv))
        wvars = {"params": wfull["lm"]}

        def wordlm_cache_init(b):
            return wlm.apply(wvars, b, method=type(wlm).init_cache)

        def wordlm_step(cache, words):
            return wlm.apply(wvars, words, 0, cache,
                             method=type(wlm).score_step)

        space = subword_dict.get("<space>", -1)
        eos_id = len(converter) - 1          # <sos/eos> is last
        if lm_model is not None:
            # char LM present -> MultiLevelLM prob-substitution; the char
            # LM is consumed here (it rides inside the combined scorer)
            if getattr(lm_cfg["model"], "lm_type", "") != "rnn":
                raise ValueError(
                    "MultiLevelLM needs an lm_type=rnn char LM in "
                    "--lm_exp_dir (position-free cache)")
            # bind to fresh names: lm_model/lm_params are rebound to None
            # below (the char LM is consumed), and the closures run lazily
            # at beam-search trace time
            clm_module, clm_vars = lm_model, {"params": lm_params}

            def clm_cache_init(b):
                return clm_module.apply(clm_vars, b,
                                        method=type(clm_module).init_cache)

            def clm_step(cache, tokens):
                return clm_module.apply(clm_vars, tokens, 0, cache,
                                        method=type(clm_module).score_step)

            ml = MultiLevelLM(
                wordlm_step, wordlm_cache_init, clm_step, clm_cache_init,
                tree, word_eos=word_eos, word_unk=word_unk, space=space,
                eos=eos_id, subword_size=len(converter),
                subwordlm_weight=args.subwordlm_weight,
                oov_penalty=(args.oov_penalty
                             if args.oov_penalty is not None else 1.0),
            )
            extra_scorers.append(Scorer(
                args.lm_weight, lambda n, s: ml.init_cache(n),
                ml.make_score_fn(), name="multilevel_lm"))
            lm_model = lm_params = None
        else:
            la = LookAheadWordLM(
                wordlm_step, wordlm_cache_init, tree,
                word_eos=word_eos, word_unk=word_unk, space=space,
                eos=eos_id, subword_size=len(converter),
                oov_penalty=(args.oov_penalty
                             if args.oov_penalty is not None else 1e-4),
            )
            extra_scorers.append(Scorer(
                args.lm_weight, lambda n, s: la.init_cache(n),
                la.make_score_fn(), name="lookahead_word_lm"))

    ngram_scorer = None
    if args.ngram_file and args.ngram_weight > 0:
        from espnet_tpu.lm.ngram import DenseNgramScorer, NgramModel

        logger.info("loading ngram: %s", args.ngram_file)
        ngram_scorer = DenseNgramScorer(
            NgramModel.load_arpa(args.ngram_file), converter.token_list
        )

    if args.search == "timesync":
        from espnet_tpu.decode.timesync import Speech2TextTimeSync

        s2t = Speech2TextTimeSync(
            model, params, extra, tokenizer, converter,
            beam_size=args.beam_size,
            ngram_scorer=ngram_scorer, ngram_weight=args.ngram_weight,
        )
    else:
        s2t = Speech2Text(
            model, params, extra, tokenizer, converter,
            beam_size=args.beam_size, ctc_weight=args.ctc_weight,
            lm_weight=args.lm_weight, lm_model=lm_model,
            lm_params=lm_params,
            ngram_scorer=ngram_scorer, ngram_weight=args.ngram_weight,
            penalty=args.penalty, maxlenratio=args.maxlenratio,
            minlenratio=args.minlenratio, max_steps=args.max_steps,
            extra_scorers=extra_scorers,
        )

    hyps_text = {}
    nbest_rows = []
    import time as _time

    audio_seconds = 0.0
    decode_seconds = 0.0
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        if data.input_type == "raw":
            audio_seconds += float(np.sum(batch["speech_lengths"])) / data.fs
        _t0 = _time.perf_counter()
        results = s2t(batch["speech"], batch["speech_lengths"], keys=keys,
                      nbest=args.nbest)
        decode_seconds += _time.perf_counter() - _t0
        for r in results:
            hyps_text[r.key] = r.text
            nbest_rows.append({
                "key": r.key, "text": r.text, "score": r.score,
                "nbest": [{"ids": ids, "score": s} for ids, s in r.nbest],
            })
        logger.info("decoded %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)
    if audio_seconds > 0:
        # RTF report (reference `utils/calculate_rtf.py:16`)
        rtf = decode_seconds / audio_seconds
        (out / "rtf.txt").write_text(
            f"decode_s {decode_seconds:.3f} audio_s {audio_seconds:.3f} "
            f"RTF {rtf:.4f}\n"
        )
        logger.info("RTF %.4f (%.1fs decode / %.1fs audio)", rtf,
                    decode_seconds, audio_seconds)
    with open(out / "nbest.jsonl", "w") as f:
        for row in nbest_rows:
            f.write(json.dumps(row) + "\n")

    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = {k: v.split() for k, v in read_2column_text(ref_path).items()
                if k in hyps_text}
        hyp_words = {k: v.split() for k, v in hyps_text.items()}
        report = sclite_report(refs, hyp_words)
        rate, _ = corpus_error_rate(refs, hyp_words)
        (out / "score_wer.txt").write_text(report + "\n")
        logger.info("WER %s", report)
        # CER
        refs_c = {k: list(" ".join(v)) for k, v in
                  ((k, v) for k, v in refs.items())}
        hyps_c = {k: list(" ".join(v)) for k, v in hyp_words.items()}
        (out / "score_cer.txt").write_text(
            sclite_report(refs_c, hyps_c) + "\n"
        )
    return hyps_text


if __name__ == "__main__":
    main()
