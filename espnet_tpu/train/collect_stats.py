"""Collect-stats pass: feature shape files + global MVN statistics.

Behavioral spec: reference `espnet2/main_funcs/collect_stats.py:20` (first
pass over the corpus writing per-key `<name>_shape` files and
`feats_stats.npz` {count, sum, sum_square} via model.collect_feats), which
feeds GlobalMVN (`espnet2/layers/global_mvn.py:13`). Here the frontend runs
jitted on device over bucketed batches.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.data.fileio import write_shape_file
from espnet_tpu.ops.masks import make_valid_mask
from espnet_tpu.ops.stft import log_mel_spectrogram


def collect_stats(
    dataset,
    batches,
    output_dir,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    n_mels: int = 80,
    input_type: str = "raw",
) -> Dict[str, np.ndarray]:
    """Returns {count, sum, sum_square} over valid feature frames and writes
    speech_shape / text_shape / feats_stats.npz under output_dir."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def feat_moments(speech, lengths):
        if input_type == "raw":
            feats, flens = log_mel_spectrogram(
                speech, lengths, fs, n_fft, hop_length, None, n_mels
            )
        else:
            feats, flens = speech, lengths
        mask = make_valid_mask(flens, feats.shape[1])[:, :, None]
        feats = feats * mask
        return (
            jnp.sum(flens),
            jnp.sum(feats, axis=(0, 1)),
            jnp.sum(feats * feats, axis=(0, 1)),
        )

    count = 0.0
    s = np.zeros((n_mels,), np.float64)
    sq = np.zeros((n_mels,), np.float64)
    speech_shapes: Dict[str, Tuple[int, ...]] = {}
    text_shapes: Dict[str, Tuple[int, ...]] = {}

    from espnet_tpu.data.dataset import collate

    for batch_spec in batches:
        batch = collate(dataset, batch_spec)
        c, s1, s2 = feat_moments(
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"])
        )
        count += float(c)
        s += np.asarray(s1, np.float64)
        sq += np.asarray(s2, np.float64)
        for i, k in enumerate(batch["keys"]):
            speech_shapes[k] = (int(batch["speech_lengths"][i]),)
            if "text_lengths" in batch:
                text_shapes[k] = (int(batch["text_lengths"][i]),)

    stats = {"count": np.asarray(count), "sum": s, "sum_square": sq}
    np.savez(out / "feats_stats.npz", **stats)
    write_shape_file(out / "speech_shape", speech_shapes)
    if text_shapes:
        write_shape_file(out / "text_shape", text_shapes)
    return stats


def load_stats(path) -> Dict[str, np.ndarray]:
    z = np.load(path)
    return {k: z[k] for k in ("count", "sum", "sum_square")}


def mvn_variables(stats: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Content of the 'mvn' variable collection for ASRModel (the inner
    'mvn' key is the GlobalMVN submodule's path inside ASRModel)."""
    from espnet_tpu.ops.normalize import global_mvn_params

    mean, inv_std = global_mvn_params(stats)
    return {"mvn": {"mean": jnp.asarray(mean), "inv_std": jnp.asarray(inv_std)}}
