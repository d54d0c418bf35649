"""Target speaker extraction inference CLI: extract the enrolled speaker
from each mixture.

Equivalent of `python -m espnet2.bin.enh_tse_inference` (reference
`espnet2/bin/enh_tse_inference.py`). Writes extracted wavs + spk1.scp;
when a reference spk1.scp exists, reports mean SI-SNR.
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
    from espnet_tpu.data.dataset import EpochIterator, TSEDataset
    from espnet_tpu.data.fileio import DatadirWriter, write_wav
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.enh.tse import TSEModel
    from espnet_tpu.ops.enh_losses import si_snr_loss
    from espnet_tpu.tasks.tse import TSETask
    from espnet_tpu.train.checkpoint import load_pytree

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = TSETask.load_config(exp)
    model = TSETask.build_model(cfg["model"])

    has_refs = (Path(args.data_dir) / "spk1.scp").exists()
    ds = TSEDataset(args.data_dir, cfg["data"].fs)
    batches = build_batches(
        {"speech_mix": ds.speech_lengths()}, batch_size=args.batch_size,
        length_quantum=cfg["data"].length_quantum, input_field="speech_mix",
    )
    fields = (("speech_mix", "enroll", "speech_ref") if has_refs
              else ("speech_mix", "enroll"))
    it = EpochIterator(ds, batches, shuffle=False, prefetch=2, fields=fields)
    batch0 = next(it.epoch(0))
    target = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch0["speech_mix"][:1]),
            jnp.asarray(batch0["speech_mix_lengths"][:1]),
            jnp.asarray(batch0["enroll"][:1]),
            jnp.asarray(batch0["enroll_lengths"][:1]),
            jnp.zeros((1, batch0["speech_mix"].shape[1]), jnp.float32),
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params}

    extract = jax.jit(
        lambda mix, lens, enr, elens: model.apply(
            variables, mix, lens, enr, elens,
            method=TSEModel.forward_enhance,
        )
    )

    snrs = []
    n_done = 0
    with DatadirWriter(out) as w:
        for batch in it.epoch(0):
            keys = batch.pop("keys")
            est, _ = extract(
                jnp.asarray(batch["speech_mix"]),
                jnp.asarray(batch["speech_mix_lengths"]),
                jnp.asarray(batch["enroll"]),
                jnp.asarray(batch["enroll_lengths"]),
            )
            est = np.asarray(est)
            if has_refs:
                ref = jnp.asarray(batch["speech_ref"])
                if ref.ndim == 3:
                    ref = ref[..., 0]
                snr = -si_snr_loss(
                    ref, jnp.asarray(est),
                    jnp.asarray(batch["speech_mix_lengths"]),
                )
                snrs.extend(np.asarray(snr).tolist())
            for j, k in enumerate(keys):
                n = int(batch["speech_mix_lengths"][j])
                path = out / "wav" / f"{k}_spk1.wav"
                write_wav(path, est[j, :n], cfg["data"].fs)
                w["spk1.scp"][k] = str(path)
            n_done += len(keys)
    logger.info("extracted %d utts", n_done)
    if snrs:
        logger.info("mean SI-SNR: %.2f dB", float(np.mean(snrs)))
        (out / "si_snr.txt").write_text(f"{float(np.mean(snrs)):.4f}\n")
    return out


if __name__ == "__main__":
    main()
