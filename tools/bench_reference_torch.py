"""Measure the REFERENCE's training throughput on the bench model config.

Retires the invented `vs_baseline` denominator (VERDICT r3 weak #6 / next
#8): the reference publishes no speed numbers and no GPU exists here, so
the only measurable same-model baseline is the reference's own torch code
on this machine's CPU — `espnet.nets.pytorch_backend.e2e_asr_conformer.E2E`
at the bench geometry (conformer 12x256/dff2048/h4 encoder, 6-layer
decoder, joint CTC/attention, vocab 5000), fed 80-dim features of B x 15 s
utterances, timed over full train steps (forward + backward + adam).

Prints one JSON line with audio-seconds/s. Run:
  python tools/bench_reference_torch.py [--batch 4] [--steps 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    from espnet.nets.pytorch_backend.e2e_asr_conformer import E2E

    mp = argparse.ArgumentParser()
    E2E.add_arguments(mp)
    margs = mp.parse_args([
        "--adim", "256", "--aheads", "4", "--eunits", "2048",
        "--elayers", "12", "--dunits", "2048", "--dlayers", "6",
        "--transformer-input-layer", "conv2d",
        "--transformer-encoder-selfattn-layer-type", "rel_selfattn",
        "--transformer-encoder-pos-enc-layer-type", "rel_pos",
        "--transformer-encoder-activation-type", "swish",
        "--use-cnn-module", "true", "--cnn-module-kernel", "31",
    ])
    margs.mtlalpha = 0.3
    margs.char_list = None
    margs.report_cer = False
    margs.report_wer = False
    margs.ctc_type = "builtin"
    margs.lsm_weight = 0.1
    margs.sym_space = "<space>"
    margs.sym_blank = "<blank>"
    model = E2E(80, 5000, margs)
    n_params = sum(p.numel() for p in model.parameters())

    b = args.batch
    t = int(args.secs * 100)  # 10 ms frames
    rng = np.random.RandomState(0)
    xs = torch.from_numpy(rng.randn(b, t, 80).astype(np.float32))
    ilens = torch.full((b,), t, dtype=torch.long)
    ys = torch.from_numpy(rng.randint(1, 4999, (b, 40)).astype(np.int64))
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    model.train()
    # warmup step (allocations, thread pools)
    loss = model(xs, ilens, ys)
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = model(xs, ilens, ys)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()
        opt.zero_grad()
    dt = (time.perf_counter() - t0) / args.steps
    audio_s = b * args.secs
    print(json.dumps({
        "metric": "reference_torch_cpu_audio_seconds_per_s",
        "value": round(audio_s / dt, 2),
        "step_time_s": round(dt, 3),
        "batch": b,
        "params": n_params,
        "threads": torch.get_num_threads(),
        "config": "reference e2e_asr_conformer 12x256 dff2048 h4 dec6 "
                  "joint-ctc/att vocab5000, torch CPU",
    }))


if __name__ == "__main__":
    main()
