"""Train a speaker embedder on a corpus and dump per-utterance embeddings.

The x-vector stage of the reference TTS recipe
(`egs2/TEMPLATE/tts1/tts.sh:346`: kaldi x-vector extraction with a
pretrained nnet). No pretrained model exists in this offline environment,
so the extractor (`models/tts/spk_embed.SpeakerEmbeddingExtractor`, TDNN +
stats pooling) is trained here on the corpus's own utt2spk labels
(speaker-classification cross-entropy), then embeddings are dumped for
every requested data dir as `spk_embed.scp` + npy files (NpyScpReader
layout), plus per-speaker means in `spk2emb.scp`.

    python -m espnet_tpu.bin.spk_embed_extract \
        --train_dir data/train --dump_dirs data/train data/dev data/test \
        --output_dir exp/spk_embed --epochs 20
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--dump_dirs", nargs="+", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--embed_dim", type=int, default=192)
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--max_frames", type=int, default=800)
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_feats(datadir: Path, n_mels: int, max_frames: int):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.fileio import read_2column_text, read_wav
    from espnet_tpu.ops.stft import log_mel_spectrogram

    wavs = read_2column_text(datadir / "wav.scp")
    out = {}
    for utt, path in wavs.items():
        x, sr = read_wav(path)
        f, fl = log_mel_spectrogram(
            jnp.asarray(x[None].astype(np.float32)),
            jnp.asarray([len(x)], np.int32), n_mels=n_mels)
        out[utt] = np.asarray(f[0, : min(int(fl[0]), max_frames)])
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax

    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.models.tts.spk_embed import SpeakerEmbeddingExtractor

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    train_dir = Path(args.train_dir)
    utt2spk = read_2column_text(train_dir / "utt2spk")
    spks = sorted(set(utt2spk.values()))
    spk2id = {s: i for i, s in enumerate(spks)}
    (out / "spk2id").write_text(
        "".join(f"{s} {i}\n" for s, i in spk2id.items()))

    feats = _load_feats(train_dir, args.n_mels, args.max_frames)
    utts = sorted(feats)
    t_max = max(f.shape[0] for f in feats.values())
    x = np.zeros((len(utts), t_max, args.n_mels), np.float32)
    lens = np.zeros((len(utts),), np.int32)
    labels = np.zeros((len(utts),), np.int32)
    for i, u in enumerate(utts):
        f = feats[u]
        x[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
        labels[i] = spk2id[utt2spk[u]]
    mean, std = x[x.sum(-1) != 0].mean(0), np.maximum(
        x[x.sum(-1) != 0].std(0), 1e-5)
    x = (x - mean) / std

    model = SpeakerEmbeddingExtractor(
        n_spk=len(spks), embed_dim=args.embed_dim, channels=args.channels)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(x[:1]), jnp.asarray(lens[:1]), True)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, lb, yb):
        def loss_fn(p):
            _, logits = model.apply(p, xb, lb, True)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, yb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    n = len(utts)
    bs = min(args.batch_size, n)
    for ep in range(args.epochs):
        order = rng.permutation(n)
        tot, cnt = 0.0, 0
        for i in range(0, n - bs + 1, bs):
            idx = order[i : i + bs]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[idx]),
                jnp.asarray(lens[idx]), jnp.asarray(labels[idx]))
            tot += float(loss)
            cnt += 1
        if (ep + 1) % max(1, args.epochs // 5) == 0:
            logger.info("epoch %d: ce %.4f", ep + 1, tot / max(cnt, 1))

    import flax.serialization as ser

    (out / "extractor.msgpack").write_bytes(ser.msgpack_serialize(
        jax.device_get(params)))
    np.savez(out / "feat_stats.npz", mean=mean, std=std)

    # dump embeddings per data dir + per-speaker means
    for d in args.dump_dirs:
        d = Path(d)
        dfeats = _load_feats(d, args.n_mels, args.max_frames)
        emb_dir = out / "embs" / d.name
        emb_dir.mkdir(parents=True, exist_ok=True)
        scp_lines, spk_acc = [], {}
        du2s = read_2column_text(d / "utt2spk") if (d / "utt2spk").exists() \
            else {}
        for utt in sorted(dfeats):
            f = (dfeats[utt] - mean) / std
            e = model.apply(params, jnp.asarray(f[None]),
                            jnp.asarray([f.shape[0]], np.int32))
            e = np.asarray(e[0], np.float32)
            npy = emb_dir / f"{utt}.npy"
            np.save(npy, e)
            scp_lines.append(f"{utt} {npy.resolve()}\n")
            if utt in du2s:
                spk_acc.setdefault(du2s[utt], []).append(e)
        (d / "spk_embed.scp").write_text("".join(scp_lines))
        mean_lines = []
        for s, es in sorted(spk_acc.items()):
            m = np.mean(es, axis=0)
            npy = emb_dir / f"spk_{s}.npy"
            np.save(npy, m)
            mean_lines.append(f"{s} {npy.resolve()}\n")
        (d / "spk2emb.scp").write_text("".join(mean_lines))
        logger.info("dumped %d embeddings -> %s", len(scp_lines),
                    d / "spk_embed.scp")


if __name__ == "__main__":
    main()
