"""Extract token durations from a trained Tacotron2 (teacher) for FastSpeech2.

Behavioral spec: reference
`espnet/nets/pytorch_backend/fastspeech/duration_calculator.py` — durations
d[u] = #decoder frames whose teacher-forced attention argmax is token u,
scaled by the reduction factor. Writes a `durations` file into the data dir.

    python -m espnet_tpu.bin.tts_teacher_durations \
        --exp_dir exp/tts_taco --data_dir data/train
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("espnet_tpu")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    import dataclasses

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.dataset import EpochIterator
    from espnet_tpu.data.fileio import write_2column_text
    from espnet_tpu.data.sampler import build_batches
    from espnet_tpu.models.tts.model import TTSModel
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.tasks.tts import TTSDatasetWithDurations, TTSTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables

    exp = Path(args.exp_dir)
    cfg = TTSTask.load_config(exp)
    data, mc = cfg["data"], cfg["model"]
    assert mc.tts_type == "tacotron2", "teacher must be a tacotron2 experiment"
    tok_data = dataclasses.replace(
        ASRTask.sections["data"](), token_type=data.token_type,
        token_list=data.token_list, bpe_model=data.bpe_model,
    )
    tokenizer = ASRTask.build_tokenizer(tok_data, exp)
    converter = ASRTask.build_token_list(tok_data, exp, tokenizer)
    model = TTSTask.build_model(mc, len(converter))

    dd = Path(args.data_dir)
    ds = TTSDatasetWithDurations(
        wav_scp=dd / "wav.scp", text=dd / "text", tokenizer=tokenizer,
        converter=converter, fs=data.fs,
    )
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(shapes, batch_size=args.batch_size,
                            length_quantum=data.length_quantum,
                            text_quantum=data.text_quantum)
    it = EpochIterator(ds, batches, shuffle=False)

    batch0 = next(it.epoch(0))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    target = nn.meta.unbox(model.init(
        rngs,
        jnp.asarray(batch0["text"][:1]), jnp.asarray(batch0["text_lengths"][:1]),
        jnp.asarray(batch0["speech"][:1]), jnp.asarray(batch0["speech_lengths"][:1]),
        deterministic=True,
    ))
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params,
                 **{k: v for k, v in target.items() if k != "params"}}
    stats_path = exp / "stats" / "feats_stats.npz"
    if mc.normalize == "global_mvn" and stats_path.exists():
        variables["mvn"] = mvn_variables(load_stats(stats_path))

    r = mc.tacotron2.reduction_factor

    @jax.jit
    def att_of(text, tl, speech, sl):
        def inner(m, text, tl, speech, sl):
            mel, ml = m.extract_feats(speech, sl)
            mel, ml = m._fit_reduction(mel, ml)
            att = m.tts.teacher_attention(text, tl, mel, ml)
            return att, ml

        return model.apply(variables, text, tl, speech, sl, method=inner,
                           rngs={"dropout": jax.random.PRNGKey(2)})

    durations = {}
    for batch in it.epoch(0):
        keys = batch.pop("keys")
        att, mel_lens = att_of(
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
        )
        att = np.asarray(att)  # (B, T_dec, T_enc)
        for i, k in enumerate(keys):
            n_dec = int(mel_lens[i]) // r
            ul = int(batch["text_lengths"][i])
            arg = att[i, :n_dec].argmax(-1)
            d = np.bincount(np.clip(arg, 0, ul - 1), minlength=ul)[:ul] * r
            durations[k] = " ".join(str(int(x)) for x in d)
        logger.info("durations for %d utts", len(durations))
    write_2column_text(dd / "durations", durations)
    logger.info("wrote %s", dd / "durations")


if __name__ == "__main__":
    main()
