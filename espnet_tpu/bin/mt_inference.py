"""MT inference CLI: translate a src_text data dir.

Equivalent of `python -m espnet2.bin.mt_inference` (reference
`espnet2/bin/mt_inference.py` Text2Text beam search).
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--max_steps", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16)
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
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.tokenizer import TokenIDConverter, build_tokenizer
    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.tasks.mt import MTTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.utils.metrics import sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = MTTask.load_config(exp)
    data = cfg["data"]
    tokenizer = build_tokenizer(data.token_type)
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    src_conv = TokenIDConverter.from_file(exp / "src_tokens.txt")
    model = MTTask.build_model(cfg["model"], len(conv), len(src_conv))

    src = read_2column_text(Path(args.data_dir) / "src_text")
    keys = list(src)
    target = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
            jnp.asarray([4]), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
            True,
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    params = load_pytree(params_file, target["params"])

    s2t = Speech2Text(
        model, params, None, tokenizer, conv,
        beam_size=args.beam_size, ctc_weight=0.0, penalty=args.penalty,
        maxlenratio=args.maxlenratio, minlenratio=args.minlenratio,
        max_steps=args.max_steps,
    )

    hyps_text = {}
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        ids = [
            np.asarray(
                src_conv.tokens2ids(tokenizer.text2tokens(src[k])), np.int32
            )
            for k in chunk
        ]
        maxlen = max(len(a) for a in ids)
        buf = np.zeros((len(ids), maxlen), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for j, a in enumerate(ids):
            buf[j, : len(a)] = a
            lens[j] = len(a)
        for r in s2t(buf, lens, keys=chunk):
            hyps_text[r.key] = r.text
        logger.info("translated %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)

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
