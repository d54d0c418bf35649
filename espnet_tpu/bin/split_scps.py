"""Split scp-style files into N shards (equivalent of
`espnet2/bin/split_scps.py`, used by the recipes' parallel decode).

    python -m espnet_tpu.bin.split_scps --scps data/test/wav.scp \
        --num_splits 4 --output_dir exp/split
"""

from __future__ import annotations

import argparse
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scps", nargs="+", required=True)
    p.add_argument("--num_splits", type=int, required=True)
    p.add_argument("--output_dir", required=True)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    out = Path(args.output_dir)
    n = args.num_splits
    first_keys = None
    for scp in args.scps:
        lines = Path(scp).read_text(encoding="utf-8").splitlines()
        keys = [ln.split(maxsplit=1)[0] for ln in lines if ln.strip()]
        if first_keys is None:
            first_keys = keys
        name = Path(scp).name
        for i in range(n):
            d = out / f"split.{i}"
            d.mkdir(parents=True, exist_ok=True)
            shard = [ln for j, ln in enumerate(lines) if j % n == i]
            (d / name).write_text("\n".join(shard) + "\n", encoding="utf-8")
    (out / "num_splits").write_text(str(n) + "\n")
    return out


if __name__ == "__main__":
    main()
