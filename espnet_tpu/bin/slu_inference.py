"""SLU inference CLI: decode + intent accuracy.

Reference analogue: `espnet2/bin/asr_inference.py` on an SLU experiment +
the recipes' intent-accuracy scoring (first token of the transcript is the
intent label).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

logger = logging.getLogger("espnet_tpu")


def main(argv=None):
    from espnet_tpu.bin.asr_inference import get_parser, main as asr_main
    from espnet_tpu.data.fileio import read_2column_text

    args = get_parser().parse_args(argv)
    asr_main(argv)
    out = Path(args.output_dir)
    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = read_2column_text(ref_path)
        hyps = read_2column_text(out / "text")
        n = correct = 0
        for k, ref in refs.items():
            if k not in hyps:
                continue
            n += 1
            ref_intent = ref.split()[0] if ref.split() else ""
            hyp_intent = hyps[k].split()[0] if hyps[k].split() else ""
            correct += int(ref_intent == hyp_intent)
        acc = correct / max(n, 1)
        (out / "intent_acc.txt").write_text(f"{acc:.4f}\n")
        logger.info("intent accuracy: %.4f (%d/%d)", acc, correct, n)
    return out


if __name__ == "__main__":
    main()
