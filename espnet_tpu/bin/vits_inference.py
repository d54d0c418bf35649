"""VITS inference CLI: text dir -> wav (end-to-end, no vocoder needed).

Reference analogue: `espnet2/bin/tts_inference.py` Text2Speech with a VITS
model (direct waveform output, `vits.py inference:541`).
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
    p.add_argument("--max_frames", type=int, default=1000)
    p.add_argument("--noise_scale", type=float, default=0.667)
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
    from espnet_tpu.models.tts.vits import VITSGenerator
    from espnet_tpu.tasks.vits import VITSTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = VITSTask.load_config(exp)
    data = cfg["data"]
    tokenizer = build_tokenizer(data.token_type)
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    gen, _ = VITSTask.build_models(cfg["model"], data, len(conv))

    rng = jax.random.PRNGKey(0)
    frames = 16
    target = nn.meta.unbox(gen.init(
        {"params": rng, "posterior": rng, "segment": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, frames, data.n_fft // 2 + 1)), jnp.asarray([frames]),
    ))["params"]
    params = load_pytree(exp / "generator.msgpack", target)

    synth = jax.jit(
        lambda t, tl: gen.apply(
            {"params": params}, t, tl, args.max_frames, args.noise_scale,
            method=VITSGenerator.inference,
            rngs={"posterior": jax.random.PRNGKey(7)},
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
