"""CTC segmentation CLI: align transcripts to audio with a trained model.

Equivalent of `python -m espnet2.bin.asr_align` (reference
`espnet2/bin/asr_align.py`, built on the CTC forced alignment of
`espnet/nets/pytorch_backend/ctc.py:163`). Writes `segments`:
`<utt> <token> <start_s> <end_s>` per aligned token.
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
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.asr import ASRModel
    from espnet_tpu.ops.ctc_align import alignment_to_segments, ctc_forced_align
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = ASRTask.load_config(exp)
    data = cfg["data"]
    tokenizer = ASRTask.build_tokenizer(data, exp)
    converter = ASRTask.build_token_list(data, exp, tokenizer)
    model = ASRTask.build_model(cfg["model"], len(converter))
    if model.config.ctc_weight <= 0:
        raise ValueError("asr_align needs a model with a CTC head")

    ds = ASRTask.build_dataset(data, args.data_dir, tokenizer, converter,
                               train=False)
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(
        shapes, batch_size=args.batch_size,
        length_quantum=data.length_quantum, text_quantum=data.text_quantum,
    )
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2)
    batch0 = next(it.epoch(0))
    target = nn.meta.unbox(
        jax.jit(model.init, static_argnums=(5,))(
            jax.random.PRNGKey(0),
            jnp.asarray(batch0["speech"][:1]),
            jnp.asarray(batch0["speech_lengths"][:1]),
            jnp.asarray(batch0["text"][:1]),
            jnp.asarray(batch0["text_lengths"][:1]),
            True,
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    params = load_pytree(params_file, target["params"])
    extra = {k: v for k, v in target.items() if k != "params"}
    stats_path = exp / "stats" / "feats_stats.npz"
    if model.config.normalize == "global_mvn" and stats_path.exists():
        extra["mvn"] = mvn_variables(load_stats(stats_path))
    variables = {"params": params, **extra}

    @jax.jit
    def align(speech, slens, text, tlens):
        enc, elens = model.apply(variables, speech, slens,
                                 method=ASRModel.encode)
        lp = model.apply(variables, enc, method=ASRModel.ctc_log_probs)
        return ctc_forced_align(lp, text, elens, tlens), elens

    mc = model.config
    frame_shift = mc.hop_length * mc.subsampling_factor / mc.fs
    lines = []
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        frame_ids, elens = align(
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
        )
        segs = alignment_to_segments(
            frame_ids, batch["text"], batch["text_lengths"], frame_shift
        )
        for key, utt_segs in zip(keys, segs):
            for tok, s, e in utt_segs:
                token = converter.ids2tokens([tok])[0]
                lines.append(f"{key} {token} {s:.3f} {e:.3f}")
        logger.info("aligned %d utts", len(lines))
    (out / "segments").write_text("\n".join(lines) + "\n")
    return out


if __name__ == "__main__":
    main()
