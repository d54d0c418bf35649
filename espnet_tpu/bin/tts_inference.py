"""TTS inference CLI: text -> mel -> Griffin-Lim -> wav.

Equivalent of `python -m espnet2.bin.tts_inference` (reference
`espnet2/bin/tts_inference.py:34`, Griffin-Lim fallback vocoder path).

    python -m espnet_tpu.bin.tts_inference --exp_dir exp/tts \
        --data_dir data/test --output_dir exp/tts/synth
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("espnet_tpu")


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True, help="dir with a 'text' file")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--max_frames", type=int, default=1024)
    p.add_argument("--griffin_lim_iters", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--vocoder_dir", default=None,
                   help="HiFiGAN vocoder exp dir (bin/vocoder_train.py); "
                        "falls back to Griffin-Lim when unset (reference "
                        "`tts_inference.py:280-291` vocoder-or-GL choice)")
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = get_parser().parse_args(argv)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import pick_params_file
    from espnet_tpu.data.fileio import read_2column_text, write_wav
    from espnet_tpu.data.tokenizer import TokenIDConverter
    from espnet_tpu.models.tts.model import TTSModel
    from espnet_tpu.ops.griffin_lim import logmel_to_wav
    from espnet_tpu.ops.normalize import global_mvn_params
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.tasks.tts import TTSTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    cfg = TTSTask.load_config(exp)
    data = cfg["data"]
    import dataclasses

    tok_data = dataclasses.replace(
        ASRTask.sections["data"](), token_type=data.token_type,
        token_list=data.token_list, bpe_model=data.bpe_model,
    )
    tokenizer = ASRTask.build_tokenizer(tok_data, exp)
    converter = ASRTask.build_token_list(tok_data, exp, tokenizer)
    model = TTSTask.build_model(cfg["model"], len(converter))
    mc = cfg["model"]

    texts = read_2column_text(Path(args.data_dir) / "text")
    # build target structure with a dummy init
    toks0 = converter.tokens2ids(tokenizer.text2tokens(next(iter(texts.values()))))
    u0 = max(8, len(toks0))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    dummy = dict(
        text=jnp.zeros((1, u0), jnp.int32),
        text_lengths=jnp.asarray([u0]),
        speech=jnp.zeros((1, 4 * mc.n_fft), jnp.float32),
        speech_lengths=jnp.asarray([4 * mc.n_fft]),
    )
    kw = {}
    if mc.tts_type in ("fastspeech2", "prodiff"):
        kw["durations"] = jnp.ones((1, u0), jnp.int32)
    target = nn.meta.unbox(
        model.init(rngs, dummy["text"], dummy["text_lengths"],
                   dummy["speech"], dummy["speech_lengths"],
                   deterministic=True, **kw)
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    variables = {"params": params,
                 **{k: v for k, v in target.items() if k != "params"}}
    stats_path = exp / "stats" / "feats_stats.npz"
    mean = inv_std = None
    if mc.normalize == "global_mvn" and stats_path.exists():
        stats = load_stats(stats_path)
        variables["mvn"] = mvn_variables(stats)
        mean, inv_std = global_mvn_params(stats)

    @jax.jit
    def synth(text, text_lengths):
        return model.apply(
            variables, text, text_lengths, args.max_frames,
            method=TTSModel.inference,
            rngs={"dropout": jax.random.PRNGKey(2),
                  "diffusion": jax.random.PRNGKey(3)},
        )

    vocode = None
    if args.vocoder_dir:
        from espnet_tpu.tasks.vocoder import VocoderTask

        vdir = Path(args.vocoder_dir)
        vcfg = VocoderTask.load_config(vdir)
        gen, _ = VocoderTask.build_models(vcfg["model"], vcfg["data"].n_mels)
        mel_frames = 16
        g_target = nn.meta.unbox(gen.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, mel_frames, vcfg["data"].n_mels)),
        ))["params"]
        g_params = load_pytree(vdir / "generator.msgpack", g_target)
        vocode = jax.jit(
            lambda mel: gen.apply(
                {"params": g_params}, mel,
                rngs={"noise": jax.random.PRNGKey(7)},
            )[..., 0]
        )
        logger.info("using %s vocoder from %s",
                    vcfg["model"].generator_type, vdir)

    keys = list(texts)
    for i in range(0, len(keys), args.batch_size):
        chunk = keys[i : i + args.batch_size]
        ids = [converter.tokens2ids(tokenizer.text2tokens(texts[k]))
               for k in chunk]
        u = max(len(x) for x in ids)
        text_arr = np.zeros((len(chunk), u), np.int32)
        lens = np.zeros((len(chunk),), np.int32)
        for j, x in enumerate(ids):
            text_arr[j, : len(x)] = x
            lens[j] = len(x)
        mel, mel_lens = synth(jnp.asarray(text_arr), jnp.asarray(lens))
        mel = np.asarray(mel)
        if mean is not None:
            mel = mel / np.maximum(inv_std, 1e-8) + mean  # denormalize
        if vocode is not None:
            wav = np.asarray(vocode(jnp.asarray(mel)))
        else:
            wav = np.asarray(logmel_to_wav(
                jnp.asarray(mel), mc.fs, mc.n_fft, mc.hop_length,
                mc.win_length, mc.n_mels, args.griffin_lim_iters,
            ))
        for j, k in enumerate(chunk):
            n = int(mel_lens[j]) * mc.hop_length
            write_wav(out / "wav" / f"{k}.wav", wav[j, :n], mc.fs)
            np.save(out / "wav" / f"{k}.mel.npy", mel[j, : int(mel_lens[j])])
        logger.info("synthesized %d/%d", min(i + len(chunk), len(keys)),
                    len(keys))


if __name__ == "__main__":
    main()
