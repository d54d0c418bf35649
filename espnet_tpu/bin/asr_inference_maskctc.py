"""Mask-CTC non-autoregressive inference CLI.

Equivalent of `python -m espnet2.bin.asr_inference_maskctc` (reference
`espnet2/bin/asr_inference_maskctc.py:1`, Speech2Text over
`maskctc_model.py:262` MaskCTCInference: greedy CTC -> mask low-confidence
tokens -> K rounds of iterative MLM infilling). Usage:

    python -m espnet_tpu.bin.asr_inference_maskctc \
        --exp_dir exp/maskctc --data_dir data/test --output_dir exp/decode \
        --maskctc_n_iterations 10 --maskctc_threshold_probability 0.99
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
    p.add_argument("--maskctc_n_iterations", type=int, default=10,
                   help="MLM infilling rounds (reference --maskctc_n_iterations)")
    p.add_argument("--maskctc_threshold_probability", type=float,
                   default=0.99,
                   help="CTC confidence below which a token is masked")
    p.add_argument("--max_tokens", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.dataset import EpochIterator
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.maskctc import MaskCTCInference
    from espnet_tpu.tasks.maskctc import MaskCTCTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables
    from espnet_tpu.utils.metrics import sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = MaskCTCTask.load_config(exp)
    data = cfg["data"]
    tokenizer = MaskCTCTask.build_tokenizer(data, exp)
    converter = MaskCTCTask.build_token_list(data, exp, tokenizer)
    model = MaskCTCTask.build_model(cfg["model"], len(converter))

    ds = MaskCTCTask.build_dataset(data, args.data_dir, tokenizer, converter,
                                   train=False)
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
    variables = {k: v for k, v in target.items() if k != "params"}
    variables["params"] = params
    stats_path = exp / "stats" / "feats_stats.npz"
    if model.config.normalize == "global_mvn" and stats_path.exists():
        variables["mvn"] = mvn_variables(load_stats(stats_path))

    infer = MaskCTCInference(
        model, variables,
        n_iterations=args.maskctc_n_iterations,
        threshold_probability=args.maskctc_threshold_probability,
        max_tokens=args.max_tokens,
    )

    hyps_text = {}
    rows = []
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        id_lists = infer(batch["speech"], batch["speech_lengths"])
        for key, ids in zip(keys, id_lists):
            toks = converter.ids2tokens(ids)
            text = tokenizer.tokens2text(toks)
            hyps_text[key] = text
            rows.append({"key": key, "text": text})
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
