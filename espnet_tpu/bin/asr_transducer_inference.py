"""Transducer ASR inference CLI.

Equivalent of `python -m espnet2.bin.asr_transducer_inference` (reference
`espnet2/bin/asr_transducer_inference.py`). Usage:

    python -m espnet_tpu.bin.asr_transducer_inference \
        --exp_dir exp/rnnt --data_dir data/test --output_dir exp/rnnt/decode \
        --beam_size 5 [--params path.msgpack]

`--beam_size 1` selects greedy search.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--search",
                   choices=["maes", "nsc", "tsd", "alsd", "greedy"],
                   default="maes")
    p.add_argument("--max_expansions", type=int, default=3)
    p.add_argument("--max_tokens", type=int, default=256)
    p.add_argument("--score_norm", default="true")
    p.add_argument("--batch_size", type=int, default=8)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.dataset import EpochIterator
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.decode.transducer_inference import Speech2TextTransducer
    from espnet_tpu.tasks.transducer import TransducerTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables
    from espnet_tpu.utils.metrics import corpus_error_rate, sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = TransducerTask.load_config(exp)
    data = cfg["data"]
    tokenizer = TransducerTask.build_tokenizer(data, exp)
    converter = TransducerTask.build_token_list(data, exp, tokenizer)
    model = TransducerTask.build_model(cfg["model"], len(converter))

    ds = TransducerTask.build_dataset(data, args.data_dir, tokenizer,
                                        converter, train=False)
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(
        shapes, batch_size=args.batch_size,
        length_quantum=data.length_quantum, text_quantum=data.text_quantum,
    )
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2)
    batch0 = next(it.epoch(0))
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

    s2t = Speech2TextTransducer(
        model, params, extra, tokenizer, converter,
        beam_size=args.beam_size, max_expansions=args.max_expansions,
        search=args.search,
        max_tokens=args.max_tokens,
        score_norm=str(args.score_norm).lower() != "false",
    )

    hyps_text = {}
    rows = []
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        for r in s2t(batch["speech"], batch["speech_lengths"], keys=keys):
            hyps_text[r.key] = r.text
            rows.append({"key": r.key, "text": r.text, "score": r.score})
        logger.info("decoded %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)
    with open(out / "nbest.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = {k: v.split() for k, v in read_2column_text(ref_path).items()
                if k in hyps_text}
        hyp_words = {k: v.split() for k, v in hyps_text.items()}
        report = sclite_report(refs, hyp_words)
        (out / "score_wer.txt").write_text(report + "\n")
        logger.info("WER %s", report)
    return out


if __name__ == "__main__":
    main()
