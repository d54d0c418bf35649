"""ST inference CLI: translate a speech data dir.

Equivalent of `python -m espnet2.bin.st_inference` (reference
`espnet2/bin/st_inference.py` Speech2Text for translation — attention-only
beam search over the translation decoder).
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
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--penalty", type=float, default=0.0)
    p.add_argument("--maxlenratio", type=float, default=0.0)
    p.add_argument("--minlenratio", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=160)
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
    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.tasks.st import STTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.utils.metrics import corpus_error_rate, sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = STTask.load_config(exp)
    data = cfg["data"]
    tokenizer = STTask.build_tokenizer(data, exp)
    conv = STTask.build_token_list(data, exp, tokenizer)
    from espnet_tpu.data.tokenizer import TokenIDConverter

    src_conv = TokenIDConverter.from_file(exp / "src_tokens.txt")
    model = STTask.build_model(cfg["model"], len(conv), len(src_conv))

    ds = STTask.build_dataset(data, args.data_dir, tokenizer, conv,
                              train=False)
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(
        shapes, batch_size=args.batch_size,
        length_quantum=data.length_quantum, text_quantum=data.text_quantum,
    )
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2)
    batch0 = next(it.epoch(0))
    target = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch0["speech"][:1]),
            jnp.asarray(batch0["speech_lengths"][:1]),
            jnp.asarray(batch0["text"][:1]),
            jnp.asarray(batch0["text_lengths"][:1]),
            jnp.asarray(batch0["text"][:1]),
            jnp.asarray(batch0["text_lengths"][:1]),
            True,
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])

    s2t = Speech2Text(
        model, params, None, tokenizer, conv,
        beam_size=args.beam_size, ctc_weight=0.0, penalty=args.penalty,
        maxlenratio=args.maxlenratio, minlenratio=args.minlenratio,
        max_steps=args.max_steps,
    )

    hyps_text = {}
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        for r in s2t(batch["speech"], batch["speech_lengths"], keys=keys):
            hyps_text[r.key] = r.text
        logger.info("translated %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)

    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = {k: v.split() for k, v in read_2column_text(ref_path).items()
                if k in hyps_text}
        hyp_words = {k: v.split() for k, v in hyps_text.items()}
        # word error rate against the reference translation (recipes report
        # BLEU; WER is the built-in analogue here)
        report = sclite_report(refs, hyp_words)
        (out / "score_wer.txt").write_text(report + "\n")
        logger.info("WER %s", report)
    return out


if __name__ == "__main__":
    main()
