"""Diarization inference CLI: wav dir -> RTTM (+ DER when a reference rttm
exists).

Equivalent of `python -m espnet2.bin.diar_inference` (reference
`espnet2/bin/diar_inference.py` DiarizeSpeech).
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
    p.add_argument("--params", default=None)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=8)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.dataset import EpochIterator
    from espnet_tpu.data.fileio import write_rttm
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.diar import DiarizationModel, diarization_error_stats
    from espnet_tpu.tasks.diar import DiarDataset, DiarTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = DiarTask.load_config(exp)
    model = DiarTask.build_model(cfg["model"])
    c = model.config

    ds = DiarDataset(args.data_dir, c.num_spk, cfg["data"].fs)
    has_ref = bool(ds.segments)
    batches = build_batches(
        {"speech": ds.speech_lengths()}, batch_size=args.batch_size,
        length_quantum=cfg["data"].length_quantum,
    )
    fields = ("speech", "spk_labels") if has_ref else ("speech",)
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2, fields=fields)
    batch0 = next(it.epoch(0))
    n0 = batch0["speech"].shape[1]
    target = nn.meta.unbox(model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch0["speech"][:1]),
        jnp.asarray(batch0["speech_lengths"][:1]),
        jnp.zeros((1, n0, c.num_spk), jnp.float32), True,
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params}

    logits_fn = jax.jit(
        lambda s, l: model.apply(
            variables, s, l, method=DiarizationModel.activity_logits
        )
    )

    frame_sec = c.hop_length * c.subsampling_factor / c.fs
    segments = {}
    ders = []
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        speech = jnp.asarray(batch["speech"])
        lens = jnp.asarray(batch["speech_lengths"])
        logits, elens = logits_fn(speech, lens)
        if has_ref:
            labels = model.apply(
                variables, jnp.asarray(batch["spk_labels"]), logits.shape[1],
                method=DiarizationModel.aggregate_labels,
            )
            stats = diarization_error_stats(logits, labels, elens,
                                            args.threshold)
            ders.append(float(stats["der"]))
        act = np.asarray(jax.nn.sigmoid(logits)) > args.threshold
        elens_np = np.asarray(elens)
        for bi, key in enumerate(keys):
            segs = []
            for s in range(c.num_spk):
                a = act[bi, : elens_np[bi], s]
                # frame runs -> time segments
                edges = np.flatnonzero(np.diff(np.r_[0, a.astype(np.int8), 0]))
                for b0, e0 in zip(edges[::2], edges[1::2]):
                    segs.append(
                        (f"spk{s + 1}", b0 * frame_sec, (e0 - b0) * frame_sec)
                    )
            segments[key] = segs
        logger.info("diarized %d utts", len(segments))
    write_rttm(out / "rttm", segments)
    if ders:
        der = float(np.mean(ders))
        (out / "der.txt").write_text(f"{der:.4f}\n")
        logger.info("DER (PIT-free, fixed mapping): %.4f", der)
    return out


if __name__ == "__main__":
    main()
