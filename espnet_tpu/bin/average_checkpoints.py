"""Average parameter snapshots (equivalent of
`utils/average_checkpoints.py` / `espnet2/main_funcs/average_nbest_models.py`).

    python -m espnet_tpu.bin.average_checkpoints \
        --inputs ep3.params.msgpack ep4.params.msgpack --output ave.msgpack
"""

from __future__ import annotations

import argparse


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--output", required=True)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    import flax.serialization as ser
    import jax
    import numpy as np

    trees = []
    for path in args.inputs:
        with open(path, "rb") as f:
            trees.append(ser.msgpack_restore(f.read()))
    n = len(trees)
    avg = jax.tree_util.tree_map(
        lambda *xs: np.sum(np.stack(xs), axis=0) / n
        if np.issubdtype(np.asarray(xs[0]).dtype, np.floating)
        else xs[0],
        *trees,
    )
    with open(args.output, "wb") as f:
        f.write(ser.msgpack_serialize(avg))
    return args.output


if __name__ == "__main__":
    main()
