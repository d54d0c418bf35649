"""SVS inference CLI: score dir -> wav via Griffin-Lim.

Reference analogue: `espnet2/bin/svs_inference.py` (SingingGenerate).
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
    p.add_argument("--griffin_lim_iters", type=int, default=32)
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
    from espnet_tpu.data.dataset import SVSDataset
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.data.tokenizer import TokenIDConverter
    from espnet_tpu.models.svs import SVSModel
    from espnet_tpu.ops.griffin_lim import logmel_to_wav
    from espnet_tpu.ops.normalize import global_mvn_params
    from espnet_tpu.tasks.svs import SVSTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = SVSTask.load_config(exp)
    data = cfg["data"]
    mc = cfg["model"]
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    model = SVSTask.build_model(mc, len(conv))
    ds = SVSDataset(args.data_dir, conv, data.fs)

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    u0 = 8
    target = nn.meta.unbox(model.init(
        rngs,
        jnp.zeros((1, u0), jnp.int32), jnp.asarray([u0]),
        jnp.zeros((1, u0), jnp.int32), jnp.ones((1, u0), jnp.int32),
        jnp.zeros((1, 8 * mc.hop_length), jnp.float32),
        jnp.asarray([8 * mc.hop_length]),
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params,
                 **{k: v for k, v in target.items() if k != "params"}}
    stats_path = exp / "stats" / "feats_stats.npz"
    mean = inv_std = None
    if mc.normalize == "global_mvn" and stats_path.exists():
        stats = load_stats(stats_path)
        variables["mvn"] = mvn_variables(stats)
        mean, inv_std = global_mvn_params(stats)

    @jax.jit
    def synth(text, tlens, midi, durations):
        mel, lens = model.apply(
            variables, text, tlens, midi, durations,
            method=SVSModel.inference,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        if mean is not None:
            mel = mel / jnp.maximum(inv_std, 1e-8) + mean
        return mel, lens

    keys = list(ds.keys())
    done = 0
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        items = [ds[k] for k in chunk]
        u = max(len(it["text"]) for it in items)
        text = np.zeros((len(items), u), np.int32)
        midi = np.zeros((len(items), u), np.int32)
        dur = np.zeros((len(items), u), np.int32)
        tlens = np.zeros((len(items),), np.int32)
        for j, it in enumerate(items):
            n = len(it["text"])
            text[j, :n] = it["text"]
            midi[j, :n] = it["midi"]
            dur[j, :n] = it["durations"]
            tlens[j] = n
        mel, lens = synth(jnp.asarray(text), jnp.asarray(tlens),
                          jnp.asarray(midi), jnp.asarray(dur))
        mel, lens = np.asarray(mel), np.asarray(lens)
        wav = np.asarray(logmel_to_wav(
            jnp.asarray(mel), mc.fs, mc.n_fft, mc.hop_length, None,
            mc.n_mels, args.griffin_lim_iters,
        ))
        for j, k in enumerate(chunk):
            n = int(lens[j]) * mc.hop_length
            write_wav(out / "wav" / f"{k}.wav", wav[j, :n], mc.fs)
        done += len(chunk)
        logger.info("synthesized %d/%d", done, len(keys))
    return out


if __name__ == "__main__":
    main()
