"""Multi-speaker ASR inference CLI: greedy CTC per speaker branch,
best-permutation WER when references exist.

Reference analogue: mixture decoding of
`espnet/nets/pytorch_backend/e2e_asr_mix.py` (`recognize` over the
per-speaker encoder branches).
"""

from __future__ import annotations

import argparse
import itertools
import logging
from pathlib import Path

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--batch_size", type=int, default=4)
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
    from espnet_tpu.data.dataset import ASRMixDataset
    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.data.tokenizer import TokenIDConverter, build_tokenizer
    from espnet_tpu.decode.ctc_greedy import collapse_ctc
    from espnet_tpu.models.asr_mix import ASRMixModel
    from espnet_tpu.tasks.asr_mix import ASRMixTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.utils.metrics import edit_distance

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = ASRMixTask.load_config(exp)
    data = cfg["data"]
    mc = cfg["model"]
    tokenizer = build_tokenizer(data.token_type, data.bpe_model or None)
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    model = ASRMixTask.build_model(mc, len(conv))
    n_spk = mc.num_spk
    ds = ASRMixDataset(args.data_dir, tokenizer, conv, n_spk, data.fs)

    rngs = {"params": jax.random.PRNGKey(0)}
    target = nn.meta.unbox(model.init(
        rngs, jnp.zeros((1, 4000), jnp.float32), jnp.asarray([4000]),
        jnp.zeros((1, n_spk, 4), jnp.int32),
        jnp.ones((1, n_spk), jnp.int32), True,
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params}

    @jax.jit
    def decode(speech, lens):
        enc, elens = model.apply(variables, speech, lens,
                                 method=ASRMixModel.encode)
        b, s, t, _ = enc.shape
        lp = model.apply(variables, enc.reshape(b * s, t, -1),
                         method=ASRMixModel.ctc_log_probs)
        return jnp.argmax(lp, -1).reshape(b, s, t), elens

    refs = [read_2column_text(Path(args.data_dir) / f"text_spk{i + 1}")
            if (Path(args.data_dir) / f"text_spk{i + 1}").exists() else None
            for i in range(n_spk)]
    has_refs = all(r is not None for r in refs)
    keys = list(ds.keys())
    total_err, total_ref = 0, 0
    with open(out / "text", "w") as f:
        for i in range(0, len(keys), args.batch_size):
            chunk = keys[i:i + args.batch_size]
            wavs = [ds[k]["speech"] for k in chunk]
            n = max(len(w) for w in wavs)
            buf = np.zeros((len(wavs), n), np.float32)
            lens = np.zeros((len(wavs),), np.int32)
            for j, w in enumerate(wavs):
                buf[j, : len(w)] = w
                lens[j] = len(w)
            paths, elens = decode(jnp.asarray(buf), jnp.asarray(lens))
            paths, elens = np.asarray(paths), np.asarray(elens)
            for j, k in enumerate(chunk):
                hyps = []
                for s in range(n_spk):
                    ids = collapse_ctc(paths[j, s, : int(elens[j])])
                    toks = conv.ids2tokens(ids)
                    hyps.append("".join(toks).replace("▁", " ").strip())
                for s, h in enumerate(hyps):
                    f.write(f"{k}_spk{s + 1} {h}\n")
                if has_refs:
                    # best-permutation word errors
                    rw = [refs[s][k].split() for s in range(n_spk)]
                    hw = [h.split() for h in hyps]
                    best = None
                    for perm in itertools.permutations(range(n_spk)):
                        e = sum(
                            edit_distance(rw[s], hw[perm[s]]).errors
                            for s in range(n_spk)
                        )
                        best = e if best is None else min(best, e)
                    total_err += best
                    total_ref += sum(len(r) for r in rw)
    if has_refs and total_ref:
        wer = 100.0 * total_err / total_ref
        logger.info("best-permutation WER: %.2f%%", wer)
        (out / "score_wer.txt").write_text(f"WER {wer:.2f}\n")
    logger.info("decoded %d utts -> %s", len(keys), out / "text")
    return out


if __name__ == "__main__":
    main()
