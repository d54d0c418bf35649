"""Train + decode the REFERENCE torch E2E transformer on AN4 (head-to-head).

Same-data comparison harness (VERDICT r3 item 2): runs the reference's own
model code — `espnet.nets.pytorch_backend.e2e_asr_transformer.E2E`
(forward `e2e_asr_transformer.py:176`, `recognize:300` joint CTC/attention
beam search) — on torch CPU, consuming byte-identical audio, splits, char
token inventory, and log-mel80+CMVN features as our recipe run, then scores
with the same sclite-style scorer. The reference's full recipe cannot run
here (Kaldi/sph2pipe/sentencepiece/chainer are not installed); this driver
replaces only the *plumbing* (feature dump, batching, optimizer loop) with
a faithful minimal equivalent and keeps all model/search math the
reference's own.

Usage:
  python tools/ref_an4_train.py --data egs_work/an4/data --out /tmp/ref_an4 \
      --epochs 300
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools" / "refstubs"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(REPO))


def build_feats(datadir: Path, sets, stats_from: str):
    """Log-mel80 (our parity-tested frontend, CPU) + global CMVN."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.data.fileio import read_2column_text, read_wav
    from espnet_tpu.ops.stft import log_mel_spectrogram

    feats = {}
    bucket = 8000  # pad waveforms to a 0.5 s grid: O(10) jit shapes, not
    # one compile per distinct utterance length
    for name in sets:
        d = datadir / name
        for utt, path in read_2column_text(d / "wav.scp").items():
            x, sr = read_wav(path)
            n = len(x)
            xp = np.zeros(-(-n // bucket) * bucket, np.float32)
            xp[:n] = x
            f, fl = log_mel_spectrogram(
                jnp.asarray(xp[None]), jnp.asarray([n], np.int32))
            feats[(name, utt)] = np.asarray(f[0, : int(fl[0])])
    tr = np.concatenate(
        [v for (s, _), v in feats.items() if s == stats_from], axis=0)
    mean, std = tr.mean(0), np.maximum(tr.std(0), 1e-8)
    return {k: (v - mean) / std for k, v in feats.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=Path, required=True)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--train_set", default="train_nodev")
    ap.add_argument("--decode_sets", default="train_nodev train_dev test")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--adim", type=int, default=64)
    ap.add_argument("--aheads", type=int, default=4)
    ap.add_argument("--eunits", type=int, default=256)
    ap.add_argument("--elayers", type=int, default=4)
    ap.add_argument("--dlayers", type=int, default=2)
    ap.add_argument("--mtlalpha", type=float, default=0.3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--beam_size", type=int, default=5)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--arch", default="transformer",
                    choices=("transformer", "conformer"))
    ap.add_argument("--cnn_module_kernel", type=int, default=15)
    # 0 = single full-corpus batch (the original AN4 head-to-head mode);
    # > 0 = shuffled length-bucketed minibatches (needed for 1k+ utts)
    ap.add_argument("--batch_size", type=int, default=0)
    ap.add_argument("--warmup_steps", type=int, default=0,
                    help="Noam-style warmup steps (0 = constant lr)")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(args.threads)
    torch.manual_seed(args.seed)
    if args.arch == "conformer":
        from espnet.nets.pytorch_backend.e2e_asr_conformer import E2E
    else:
        from espnet.nets.pytorch_backend.e2e_asr_transformer import E2E

    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.data.tokenizer import (
        CharTokenizer, TokenIDConverter, build_token_list)
    from espnet_tpu.utils.metrics import corpus_error_rate, sclite_report

    datadir, out = args.data, args.out
    out.mkdir(parents=True, exist_ok=True)
    sets = args.decode_sets.split()
    if args.train_set not in sets:
        sets = [args.train_set] + sets

    texts = {s: read_2column_text(datadir / s / "text") for s in sets}
    tok = CharTokenizer()
    # our build_token_list layout == v1 convention (SURVEY §2.2):
    # <blank>=0, <unk>=1, tokens..., <sos/eos> = odim-1
    token_list = build_token_list(list(texts[args.train_set].values()), tok)
    conv = TokenIDConverter(token_list)
    odim = len(token_list)

    feats = build_feats(datadir, sets, args.train_set)
    idim = next(iter(feats.values())).shape[1]

    # model args: E2E.add_arguments defaults + the train-level knobs the
    # v1 parser would add (espnet/bin/asr_train.py)
    mp = argparse.ArgumentParser()
    E2E.add_arguments(mp)
    flags = [
        "--adim", str(args.adim), "--aheads", str(args.aheads),
        "--eunits", str(args.eunits), "--elayers", str(args.elayers),
        "--dunits", str(args.eunits), "--dlayers", str(args.dlayers),
        "--transformer-input-layer", "conv2d",
        "--dropout-rate", str(args.dropout),
    ]
    if args.arch == "conformer":
        # the reference conformer recipe settings (rel-pos MHSA + macaron +
        # conv module, egs2/librispeech_100 tuning yaml)
        flags += [
            "--transformer-encoder-pos-enc-layer-type", "rel_pos",
            "--transformer-encoder-selfattn-layer-type", "rel_selfattn",
            "--macaron-style", "true",
            "--use-cnn-module", "true",
            "--cnn-module-kernel", str(args.cnn_module_kernel),
        ]
    margs = mp.parse_args(flags)
    # train-level args the v1 parser (espnet/bin/asr_train.py) would add
    margs.mtlalpha = args.mtlalpha
    margs.char_list = token_list
    margs.report_cer = False
    margs.report_wer = False
    margs.ctc_type = "builtin"
    margs.lsm_weight = 0.1
    margs.sym_space = "<space>"
    margs.sym_blank = "<blank>"
    model = E2E(idim, odim, margs)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference E2E: idim {idim} odim {odim} params {n_params}")

    # training data: padded per batch (CustomConverter semantics: feats
    # zero-pad, labels pad with ignore_id=-1)
    tr_utts = sorted(texts[args.train_set])
    xs = [feats[(args.train_set, u)] for u in tr_utts]
    ys = [np.asarray(conv.tokens2ids(tok.text2tokens(
        texts[args.train_set][u])), np.int64) for u in tr_utts]

    def pad_batch(idx):
        bx = [xs[i] for i in idx]
        by = [ys[i] for i in idx]
        ilens = torch.tensor([len(x) for x in bx])
        xp = torch.zeros(len(bx), int(ilens.max()), idim)
        for i, x in enumerate(bx):
            xp[i, : len(x)] = torch.from_numpy(x)
        yp = torch.full((len(by), max(len(y) for y in by)), -1,
                        dtype=torch.long)
        for i, y in enumerate(by):
            yp[i, : len(y)] = torch.from_numpy(y)
        return xp, ilens, yp

    opt = torch.optim.Adam(model.parameters(), lr=args.lr,
                           betas=(0.9, 0.98), eps=1e-9)
    model.train()
    t0 = time.time()
    step = 0
    if args.batch_size <= 0:
        batches = [list(range(len(xs)))]
        rng = None
    else:
        # length-sorted buckets (seq2seq batching, v1 batchfy "seq" mode),
        # shuffled each epoch
        order = np.argsort([len(x) for x in xs])
        batches = [list(order[i: i + args.batch_size])
                   for i in range(0, len(order), args.batch_size)]
        rng = np.random.RandomState(args.seed)
    for ep in range(args.epochs):
        if rng is not None:
            rng.shuffle(batches)
        ep_loss, nb = 0.0, 0
        for idx in batches:
            step += 1
            if args.warmup_steps > 0:
                lr = args.lr * min(step ** -0.5 * args.warmup_steps ** 0.5,
                                   step / args.warmup_steps)
                for gr in opt.param_groups:
                    gr["lr"] = lr
            opt.zero_grad()
            loss = model(*pad_batch(idx))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
            opt.step()
            ep_loss += float(loss)
            nb += 1
        if (ep + 1) % max(1, args.epochs // 20) == 0 or ep == 0:
            print(f"epoch {ep + 1}: loss {ep_loss / nb:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_time = time.time() - t0

    # decode (reference beam search: E2E.recognize -> BeamSearch api v1)
    rargs = argparse.Namespace(
        beam_size=args.beam_size, penalty=0.0, ctc_weight=args.mtlalpha,
        maxlenratio=0.0, minlenratio=0.0, lm_weight=0.0, nbest=1)
    model.eval()
    summary = {"params": n_params, "train_time_s": round(train_time, 1),
               "epochs": args.epochs}
    # decode ONLY the requested sets: `sets` has the train set prepended
    # for feature/CMVN building, and the reference's python-loop beam
    # search at ~4 s/utt makes an accidental 1500-utt train decode cost
    # ~95 min (it did, round 5)
    for s in args.decode_sets.split():
        hyps = {}
        t0 = time.time()
        for u in sorted(texts[s]):
            nbest = model.recognize(feats[(s, u)], rargs)
            ids = [i for i in nbest[0]["yseq"][1:] if i != odim - 1]
            hyps[u] = tok.tokens2text(conv.ids2tokens(ids))
        dec_time = time.time() - t0
        refs = {u: t.split() for u, t in texts[s].items()}
        hypw = {u: t.split() for u, t in hyps.items()}
        report = sclite_report(refs, hypw)
        rate, _ = corpus_error_rate(refs, hypw)
        sd = out / f"decode_{s}"
        sd.mkdir(exist_ok=True)
        (sd / "text").write_text(
            "".join(f"{u} {t}\n" for u, t in sorted(hyps.items())))
        (sd / "score_wer.txt").write_text(report + "\n")
        summary[s] = {"wer": round(100.0 * rate, 1),
                      "decode_time_s": round(dec_time, 1)}
        print(f"[{s}] WER {100.0 * rate:.1f}\n{report}")
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
