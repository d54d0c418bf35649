"""Attention-heatmap dumps during training.

Behavioral spec: reference `espnet2/train/trainer.py:787`
(Trainer.plot_attention: one validation batch per epoch through
`calculate_all_attentions`, heatmap PNG per utterance/head under
<out>/att_ws/, plus TensorBoard images).

Two capture paths:
- models exposing `teacher_attention(...)` (Tacotron2/VC): a (B, T_dec,
  T_enc) alignment from the teacher-forced scan;
- everything built on `models.attention.MultiHeadAttention`: weights are
  sown into the 'intermediates' collection when the forward pass runs with
  `mutable=["intermediates"]` (zero cost otherwise; the flash-kernel path
  never materializes weights, so capture uses the XLA path, which is the
  one active at decoder-sized sequence lengths anyway).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax
import numpy as np

logger = logging.getLogger("espnet_tpu")


def collect_attention_maps(model, variables, batch, batch_arg_names,
                           rngs=None) -> Dict[str, np.ndarray]:
    """Returns {name: (B, T_q, T_k) float arrays} for one batch."""
    args = [batch[k] for k in batch_arg_names]
    if hasattr(type(model), "teacher_attention"):
        att = model.apply(variables, *args,
                          method=type(model).teacher_attention,
                          rngs=rngs or {"dropout": jax.random.PRNGKey(0)})
        return {"decoder_att": np.asarray(att, np.float32)}
    out, inter = model.apply(
        variables, *args, deterministic=True,
        mutable=["intermediates"],
        rngs=rngs or {"dropout": jax.random.PRNGKey(0)},
    )
    maps: Dict[str, np.ndarray] = {}
    from flax import traverse_util

    flat = traverse_util.flatten_dict(
        inter.get("intermediates", {}), sep="/")
    for key, val in flat.items():
        if "attn" not in key:
            continue
        arr = val[0] if isinstance(val, (tuple, list)) else val
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 4:  # (B, H, Tq, Tk) -> mean over heads
            maps[key.replace("/", ".")] = arr.mean(axis=1)
        elif arr.ndim == 3:
            maps[key.replace("/", ".")] = arr
    return maps


def dump_attention_plots(model, variables, batch, out_dir, epoch,
                         batch_arg_names, tb=None, max_utts: int = 2,
                         rngs=None) -> int:
    """Write heatmap PNGs to <out_dir>/att_ws/ep<epoch>/; returns #images."""
    try:
        maps = collect_attention_maps(model, variables, batch,
                                      batch_arg_names, rngs)
    except Exception as e:  # pragma: no cover - model without attention
        logger.warning("attention plot skipped: %s", e)
        return 0
    if not maps:
        return 0
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir) / "att_ws" / f"ep{epoch}"
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    keys = batch.get("keys")
    for name, arr in maps.items():
        for b in range(min(arr.shape[0], max_utts)):
            utt = keys[b] if keys is not None else f"utt{b}"
            fig, ax = plt.subplots(figsize=(5, 4))
            im = ax.imshow(arr[b], aspect="auto", origin="lower",
                           interpolation="nearest")
            fig.colorbar(im, ax=ax)
            ax.set_title(f"{name} {utt}")
            ax.set_xlabel("key frame")
            ax.set_ylabel("query frame")
            safe = name.replace(".", "_")[:80]
            fig.savefig(out / f"{safe}.{utt}.png", bbox_inches="tight")
            plt.close(fig)
            n += 1
            if tb is not None and getattr(tb, "writer", None) is not None:
                tb.writer.add_image(
                    f"attention/{name}/{utt}",
                    (arr[b][None] / max(arr[b].max(), 1e-8)).clip(0, 1),
                    epoch,
                )
    return n
