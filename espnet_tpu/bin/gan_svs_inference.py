"""VISinger inference CLI: score dir -> wav (end-to-end).

Reference analogue: `espnet2/bin/svs_inference.py` with a VISinger model
(direct waveform output).
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

    from espnet_tpu.data.dataset import SVSDataset
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.data.tokenizer import TokenIDConverter
    from espnet_tpu.models.tts.visinger import VISingerGenerator
    from espnet_tpu.tasks.gan_svs import GanSVSTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = GanSVSTask.load_config(exp)
    data = cfg["data"]
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    gen, _ = GanSVSTask.build_models(cfg["model"], data, len(conv))

    rng = jax.random.PRNGKey(0)
    frames = 16
    target = nn.meta.unbox(gen.init(
        {"params": rng, "posterior": rng, "segment": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, frames, data.n_fft // 2 + 1)), jnp.asarray([frames]),
    ))["params"]
    params = load_pytree(exp / "generator.msgpack", target)

    synth = jax.jit(
        lambda t, m, d, tl: gen.apply(
            {"params": params}, t, m, d, tl, args.max_frames,
            args.noise_scale, method=VISingerGenerator.inference,
            rngs={"posterior": jax.random.PRNGKey(7)},
        )
    )

    ds = SVSDataset(args.data_dir, conv, data.fs)
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
        wav, wav_lens = synth(jnp.asarray(text), jnp.asarray(midi),
                              jnp.asarray(dur), jnp.asarray(tlens))
        wav, wav_lens = np.asarray(wav), np.asarray(wav_lens)
        for j, k in enumerate(chunk):
            write_wav(out / "wav" / f"{k}.wav",
                      wav[j, : int(wav_lens[j])], data.fs)
        done += len(chunk)
        logger.info("synthesized %d/%d", done, len(keys))
    return out


if __name__ == "__main__":
    main()
