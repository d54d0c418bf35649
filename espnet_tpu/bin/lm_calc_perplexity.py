"""Compute corpus perplexity with a trained LM.

Equivalent of `python -m espnet2.bin.lm_calc_perplexity` (reference
`espnet2/bin/lm_calc_perplexity.py`).
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
    p.add_argument("--batch_size", type=int, default=32)
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
    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.tasks.lm import LMTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    from espnet_tpu.data.tokenizer import TokenIDConverter, build_tokenizer

    cfg = LMTask.load_config(exp)
    data = cfg["data"]
    if data.token_type == "bpe":
        tokenizer = build_tokenizer("bpe", data.bpe_model or str(exp / "bpe.json"))
    else:
        tokenizer = build_tokenizer(data.token_type)
    converter = TokenIDConverter.from_file(
        Path(data.token_list) if data.token_list else exp / "tokens.txt"
    )
    model = LMTask.build_model(cfg["model"], len(converter))

    target = nn.meta.unbox(jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]), True,
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params}

    @jax.jit
    def nll_fn(text, lens):
        loss, stats = model.apply(variables, text, lens, True)
        return stats["nll_sum"], stats["ntokens"]

    texts = read_2column_text(Path(args.data_dir) / "text")
    keys = list(texts)
    total_nll = 0.0
    total_tok = 0
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        ids = [np.asarray(converter.tokens2ids(
            tokenizer.text2tokens(texts[k])), np.int32) for k in chunk]
        u = max(len(a) for a in ids)
        buf = np.zeros((len(ids), u), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for j, a in enumerate(ids):
            buf[j, : len(a)] = a
            lens[j] = len(a)
        nll, ntok = nll_fn(jnp.asarray(buf), jnp.asarray(lens))
        total_nll += float(nll)
        total_tok += int(ntok)
    ppl = float(np.exp(total_nll / max(total_tok, 1)))
    (out / "ppl").write_text(f"{ppl:.4f}\n")
    logger.info("perplexity: %.4f over %d tokens", ppl, total_tok)
    return ppl


if __name__ == "__main__":
    main()
