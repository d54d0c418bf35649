"""Unsupervised ASR inference CLI: greedy phone decoding.

Reference analogue: `espnet2/bin/uasr_inference.py` (argmax over the
generator's phone distributions, collapse repeats).
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
    p.add_argument("--batch_size", type=int, default=8)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.data.fileio import SoundScpReader
    from espnet_tpu.data.tokenizer import TokenIDConverter
    from espnet_tpu.models.uasr import UASRGenerator
    from espnet_tpu.ops.stft import log_mel_spectrogram
    from espnet_tpu.tasks.uasr import UASRTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = UASRTask.load_config(exp)
    data = cfg["data"]
    conv = TokenIDConverter.from_file(exp / "tokens.txt")
    ucfg = UASRTask.build_config(cfg["model"], data, len(conv))
    gen = UASRGenerator(ucfg)

    frames = 64
    target = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, frames, data.n_mels)),
        jnp.asarray([frames]),
    )["params"]
    params = load_pytree(exp / "generator.msgpack", target)

    @jax.jit
    def decode(w, wl):
        feats, flens = log_mel_spectrogram(
            w, wl, data.fs, data.n_fft, data.hop_length, None, data.n_mels
        )
        logits, out_lens, mask = gen.apply({"params": params}, feats, flens)
        return jnp.argmax(logits, axis=-1), out_lens

    reader = SoundScpReader(Path(args.data_dir) / "wav.scp")
    keys = list(reader.keys())
    hyps = {}
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i:i + args.batch_size]
        wavs = [reader[k][0].astype(np.float32) for k in chunk]
        wavs = [w[:, 0] if w.ndim > 1 else w for w in wavs]
        n = max(len(w) for w in wavs)
        buf = np.zeros((len(wavs), n), np.float32)
        lens = np.zeros((len(wavs),), np.int32)
        for j, w in enumerate(wavs):
            buf[j, : len(w)] = w
            lens[j] = len(w)
        ids, out_lens = decode(jnp.asarray(buf), jnp.asarray(lens))
        ids, out_lens = np.asarray(ids), np.asarray(out_lens)
        for j, k in enumerate(chunk):
            seq = ids[j, : int(out_lens[j])].tolist()
            # collapse repeats
            collapsed = [s for n_, s in enumerate(seq)
                         if n_ == 0 or s != seq[n_ - 1]]
            toks = conv.ids2tokens(collapsed)
            hyps[k] = "".join(toks).replace("▁", " ").strip()
    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")
    logger.info("decoded %d utts -> %s", len(hyps), out / "text")
    return out


if __name__ == "__main__":
    main()
