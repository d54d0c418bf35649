"""JETS inference CLI: text dir -> wav (end-to-end, no vocoder needed).

Reference analogue: `espnet2/bin/tts_inference.py` Text2Speech with a JETS
model (direct waveform output, `espnet2/gan_tts/jets/jets.py` inference).
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

    from espnet_tpu.data.fileio import read_2column_text, write_wav
    from espnet_tpu.data.tokenizer import TokenIDConverter, build_tokenizer
    from espnet_tpu.models.tts.jets import JETSGenerator
    from espnet_tpu.tasks.jets import JETSTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = JETSTask.load_config(exp)
    data = cfg["data"]
    tokenizer = build_tokenizer(data.token_type)
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    gen, _ = JETSTask.build_models(cfg["model"], data, len(conv))

    rng = jax.random.PRNGKey(0)
    frames = 16
    target = nn.meta.unbox(gen.init(
        {"params": rng, "segment": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, frames, data.n_mels)), jnp.asarray([frames]),
        jnp.zeros((1, frames)), jnp.zeros((1, frames)),
    ))["params"]
    params = load_pytree(exp / "generator.msgpack", target)

    synth = jax.jit(
        lambda t, tl: gen.apply(
            {"params": params}, t, tl, method=JETSGenerator.inference,
        )
    )

    texts = read_2column_text(Path(args.data_dir) / "text")
    keys = list(texts)
    done = 0
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        ids = [np.asarray(conv.tokens2ids(tokenizer.text2tokens(texts[k])),
                          np.int32) for k in chunk]
        u = max(len(a) for a in ids)
        buf = np.zeros((len(ids), u), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for j, a in enumerate(ids):
            buf[j, : len(a)] = a
            lens[j] = len(a)
        wav, wav_lens = synth(jnp.asarray(buf), jnp.asarray(lens))
        wav, wav_lens = np.asarray(wav), np.asarray(wav_lens)
        for j, k in enumerate(chunk):
            write_wav(out / "wav" / f"{k}.wav",
                      wav[j, : int(wav_lens[j])], data.fs)
        done += len(chunk)
        logger.info("synthesized %d/%d", done, len(keys))
    return out


if __name__ == "__main__":
    main()
