"""Enhancement inference CLI: separate a data dir of mixtures.

Equivalent of `python -m espnet2.bin.enh_inference` (reference
`espnet2/bin/enh_inference.py` SeparateSpeech). Writes per-speaker wavs +
spk<i>.scp; when reference spk scps exist, reports mean SI-SNR per speaker
(PIT-aligned).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--batch_size", type=int, default=4)
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
    from espnet_tpu.data.dataset import EnhDataset, EpochIterator
    from espnet_tpu.data.fileio import DatadirWriter, write_wav
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.enh import EnhancementModel
    from espnet_tpu.ops.enh_losses import pit_solve, si_snr_loss
    from espnet_tpu.tasks.enh import EnhTask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = EnhTask.load_config(exp)
    model = EnhTask.build_model(cfg["model"])
    n_spk = model.config.num_spk

    has_refs = (Path(args.data_dir) / "spk1.scp").exists()
    ds = EnhDataset(args.data_dir, n_spk if has_refs else 0, cfg["data"].fs)
    batches = build_batches(
        {"speech_mix": ds.speech_lengths()}, batch_size=args.batch_size,
        length_quantum=cfg["data"].length_quantum, input_field="speech_mix",
    )
    fields = ("speech_mix", "speech_ref") if has_refs else ("speech_mix",)
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2, fields=fields)
    batch0 = next(it.epoch(0))
    target = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch0["speech_mix"][:1]),
            jnp.asarray(batch0["speech_mix_lengths"][:1]),
            jnp.zeros((1, batch0["speech_mix"].shape[1], max(n_spk, 1)),
                      jnp.float32),
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params}

    enhance = jax.jit(
        lambda mix, lens: model.apply(
            variables, mix, lens, method=EnhancementModel.forward_enhance
        )
    )

    si_snrs = []
    rows = []
    with DatadirWriter(out) as w:
        for batch in it.epoch(0):
            keys = batch.pop("keys")
            mix = jnp.asarray(batch["speech_mix"])
            lens = jnp.asarray(batch["speech_mix_lengths"])
            est, _ = enhance(mix, lens)
            est_np = np.asarray(est)
            if has_refs:
                refs = jnp.asarray(batch["speech_ref"]).transpose(0, 2, 1)
                loss, perm = pit_solve(
                    lambda r, e: si_snr_loss(r, e, lens), refs, est
                )
                si_snrs.extend((-np.asarray(loss)).tolist())
            for bi, key in enumerate(keys):
                n = int(batch["speech_mix_lengths"][bi])
                for s in range(n_spk):
                    path = out / "wav" / f"{key}_spk{s + 1}.wav"
                    write_wav(path, est_np[bi, s, :n], cfg["data"].fs)
                    w[f"spk{s + 1}.scp"][key] = str(path)
                rows.append({"key": key})
            logger.info("separated %d utts", len(rows))
    if si_snrs:
        mean_si_snr = float(np.mean(si_snrs))
        (out / "si_snr.txt").write_text(f"{mean_si_snr:.4f}\n")
        logger.info("mean SI-SNR: %.2f dB", mean_si_snr)
    return out


if __name__ == "__main__":
    main()
