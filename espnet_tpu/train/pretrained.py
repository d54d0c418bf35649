"""Partial parameter transfer from pretrained checkpoints.

Behavioral spec: reference `espnet2/torch_utils/load_pretrained_model.py`
(init_param spec `path:src_key:dst_key:exclude_keys` — copy the subtree
under src_key in the checkpoint into the subtree under dst_key of the
model, skipping excluded keys and shape mismatches). This is the SSL
fine-tuning path: pretrain HuBERT, then seed an ASR encoder from it.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import numpy as np
from flax import serialization, traverse_util

logger = logging.getLogger("espnet_tpu")


def parse_init_param(spec: str) -> Tuple[str, str, str, Tuple[str, ...]]:
    """"path:src:dst:excl1,excl2" -> (path, src, dst, excludes)
    (`load_pretrained_model.py` spec format)."""
    parts = (spec.split(":") + ["", "", ""])[:4]
    path, src, dst, excl = parts
    excludes = tuple(x for x in excl.split(",") if x)
    return path, src, dst, excludes


def load_pretrained(params: Dict, spec: str) -> Tuple[Dict, int, int]:
    """Returns (updated params, n_copied, n_considered)."""
    path, src_key, dst_key, excludes = parse_init_param(spec)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    from flax import linen as nn

    flat_src = traverse_util.flatten_dict(raw, sep="/")
    flat_dst = dict(traverse_util.flatten_dict(params, sep="/"))

    def _unbox(x):
        # params may carry partitioning metadata (nn.with_logical_partitioning)
        return x.unbox() if isinstance(x, nn.meta.AxisMetadata) else x

    copied = considered = 0
    for k, v in flat_src.items():
        v = _unbox(v)
        if src_key:
            if not (k == src_key or k.startswith(src_key + "/")):
                continue
            rel = k[len(src_key):].lstrip("/")
        else:
            rel = k
        dk = f"{dst_key}/{rel}".strip("/") if dst_key else rel
        if any(e in dk for e in excludes):
            continue
        considered += 1
        cur = flat_dst.get(dk)
        cur_val = _unbox(cur) if cur is not None else None
        if cur_val is not None and np.shape(cur_val) == np.shape(v):
            new = np.asarray(v, dtype=np.asarray(cur_val).dtype)
            if isinstance(cur, nn.meta.AxisMetadata):
                flat_dst[dk] = cur.replace_boxed(new)
            else:
                flat_dst[dk] = new
            copied += 1
        else:
            logger.warning("init_param: no match for %s", dk)
    logger.info("init_param %s: copied %d/%d arrays", path, copied,
                considered)
    return traverse_util.unflatten_dict(flat_dst, sep="/"), copied, considered
