"""Streaming ASR inference CLI: simulate chunked online decoding.

Equivalent of `python -m espnet2.bin.asr_inference_streaming` (reference
`espnet2/bin/asr_inference_streaming.py:37` Speech2TextStreaming driven by
its `inference` main: each utterance is fed in `sim_chunk_length`-sample
chunks, the last chunk with is_final=True). Requires a model trained with
encoder_type=contextual_block_conformer. Usage:

    python -m espnet_tpu.bin.asr_inference_streaming \
        --exp_dir exp/stream --data_dir data/test --output_dir exp/decode \
        --sim_chunk_length 1600 --search beam --beam_size 10
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
    p.add_argument("--sim_chunk_length", type=int, default=1600,
                   help="samples per simulated streaming chunk "
                        "(reference --sim_chunk_length)")
    p.add_argument("--search", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--penalty", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=64)
    p.add_argument("--engine", choices=["device", "host"], default="device",
                   help="'device' = fixed-shape device-resident recognizer "
                        "(decode/streaming_device.py, one dispatch per "
                        "quantum); 'host' = the host-buffered reference-"
                        "style implementation (decode/streaming_inference.py)")
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
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    if args.engine == "device":
        from espnet_tpu.decode.streaming_device import (
            DeviceStreamingRecognizer as Speech2TextStreaming,
        )
    else:
        from espnet_tpu.decode.streaming_inference import Speech2TextStreaming
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.checkpoint import load_pytree
    from espnet_tpu.train.collect_stats import load_stats, mvn_variables
    from espnet_tpu.utils.metrics import sclite_report

    exp = Path(args.exp_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = ASRTask.load_config(exp)
    data = cfg["data"]
    tokenizer = ASRTask.build_tokenizer(data, exp)
    converter = ASRTask.build_token_list(data, exp, tokenizer)
    model = ASRTask.build_model(cfg["model"], len(converter))
    if data.input_type != "raw":
        raise ValueError("streaming inference consumes raw waveforms")

    ds = ASRTask.build_dataset(data, args.data_dir, tokenizer, converter,
                               train=False)
    keys = ds.keys()
    first = ds[keys[0]]
    n0 = first["speech"].shape[0]
    target = nn.meta.unbox(
        jax.jit(model.init, static_argnums=(5,))(
            jax.random.PRNGKey(0),
            jnp.asarray(first["speech"][None]),
            jnp.asarray([n0], np.int32),
            jnp.asarray(first["text"][None]),
            jnp.asarray([first["text"].shape[0]], np.int32),
            True,
        )
    )
    params_file = Path(args.params) if args.params else pick_params_file(exp)
    logger.info("loading params: %s", params_file)
    params = load_pytree(params_file, target["params"])
    extra = {k: v for k, v in target.items() if k != "params"}
    stats_path = exp / "stats" / "feats_stats.npz"
    if model.config.normalize == "global_mvn" and stats_path.exists():
        extra["mvn"] = mvn_variables(load_stats(stats_path))

    s2t = Speech2TextStreaming(
        model, params, extra, tokenizer, converter,
        search=args.search, beam_size=args.beam_size,
        ctc_weight=args.ctc_weight, penalty=args.penalty,
        max_steps=args.max_steps,
    )

    hyps_text = {}
    rows = []
    chunk = max(1, args.sim_chunk_length)
    for key in keys:
        wave = np.asarray(ds[key]["speech"], np.float32).reshape(-1)
        res = None
        for i in range(0, max(len(wave), 1), chunk):
            last = i + chunk >= len(wave)
            res = s2t(wave[i:i + chunk], is_final=last)
        hyps_text[key] = res["text"]
        rows.append({"key": key, "text": res["text"],
                     "token_ids": res["token_ids"]})
        if len(hyps_text) % 10 == 0:
            logger.info("decoded %d utts", len(hyps_text))
    logger.info("decoded %d utts", len(hyps_text))
    write_2column_text(out / "text", hyps_text)
    with open(out / "nbest.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    ref_path = Path(args.data_dir) / "text"
    if ref_path.exists():
        refs = {k: v.split() for k, v in read_2column_text(ref_path).items()
                if k in hyps_text}
        hyp_words = {k: v.split() for k, v in hyps_text.items()}
        report = sclite_report(refs, hyp_words)
        (out / "score_wer.txt").write_text(report + "\n")
        logger.info("WER %s", report)
    return out


if __name__ == "__main__":
    main()
