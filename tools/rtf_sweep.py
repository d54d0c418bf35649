"""Decode-RTF sweep on the real chip (VERDICT r3 item 8).

Thickens BASELINE.md's single decode-RTF point into a table: offline
joint CTC/attention batched beam search over beam x batch, plus a
streaming (contextual-block conformer + block-synchronous greedy) RTF
line. RTF = decode wall time / audio duration (reference tooling
`utils/calculate_rtf.py:16-107`). Untrained weights never emit <eos>, so
the label budget is capped like bench.py (cap150 ~ 10 tok/s of speech).

  python tools/rtf_sweep.py        # prints a markdown table + JSON lines
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FS = 16000


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    secs, steps_cap = 15.0, 150
    rng = np.random.RandomState(0)
    rows = []

    # --- offline: the bench flagship conformer ---
    cfg = ASRConfig(
        vocab_size=5000, input_type="raw", n_mels=80, use_specaug=True,
        normalize="utterance_mvn", encoder_type="conformer", d_model=256,
        num_heads=4, d_ff=2048, num_encoder_layers=12, num_decoder_layers=6,
        decoder_d_ff=2048, ctc_weight=0.3, dtype=jnp.bfloat16)
    model = ASRModel(cfg)
    tiny = (jnp.asarray(rng.randn(1, FS), jnp.float32),
            jnp.asarray([FS], np.int32),
            jnp.asarray([[1, 2, 3, 4]], np.int32),
            jnp.asarray([4], np.int32))
    variables = nn.meta.unbox(jax.jit(model.init, static_argnums=(5,))(
        jax.random.PRNGKey(0), *tiny, True))
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    for batch in (1, 8):
        speech = rng.randn(batch, int(secs * FS)).astype(np.float32) * 0.1
        lens = np.full((batch,), int(secs * FS), np.int32)
        for beam in (1, 5, 10, 20):
            s2t = Speech2Text(model, params, extra_vars=extra,
                              beam_size=beam, ctc_weight=0.3,
                              max_steps=steps_cap)
            s2t(speech, lens)  # compile + warmup
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                s2t(speech, lens)
            dt = time.perf_counter() - t0
            rtf = dt / (reps * batch * secs)
            rows.append({"mode": "offline", "beam": beam, "batch": batch,
                         "rtf": round(rtf, 5)})
            print(f"# offline beam={beam:2d} batch={batch}: RTF {rtf:.5f}",
                  file=sys.stderr, flush=True)

    # --- streaming: contextual-block conformer --------------------------
    # engines: "device" = fixed-shape device-resident recognizer (one
    # dispatch per 0.512 s quantum, decode/streaming_device.py); "host" =
    # the round-4 host-buffered implementation kept for comparison.
    try:
        scfg = ASRConfig(
            vocab_size=5000, input_type="raw", n_mels=80, use_specaug=False,
            normalize="none", encoder_type="contextual_block_conformer",
            d_model=256, num_heads=4, d_ff=2048, num_encoder_layers=12,
            num_decoder_layers=6, decoder_d_ff=2048, ctc_weight=0.3,
            dtype=jnp.bfloat16)
        smodel = ASRModel(scfg)
        svars = nn.meta.unbox(jax.jit(smodel.init, static_argnums=(5,))(
            jax.random.PRNGKey(0), *tiny, True))
        sextra = {k: v for k, v in svars.items() if k != "params"}
        wav = rng.randn(int(secs * FS)).astype(np.float32) * 0.1
        chunk = 8000  # 0.5 s chunks

        def run_streaming(s2ts, label, reps=2):
            for i in range(0, len(wav), chunk):  # warmup/compile pass
                s2ts(wav[i:i + chunk], is_final=i + chunk >= len(wav))
            t0 = time.perf_counter()
            for _ in range(reps):
                for i in range(0, len(wav), chunk):
                    s2ts(wav[i:i + chunk], is_final=i + chunk >= len(wav))
            dt = time.perf_counter() - t0
            rtf = dt / (reps * secs)
            rows.append({"mode": label, "chunk_s": 0.5,
                         "rtf": round(rtf, 5)})
            print(f"# {label} chunk=0.5s: RTF {rtf:.5f}",
                  file=sys.stderr, flush=True)

        from espnet_tpu.decode.streaming_device import (
            DeviceStreamingRecognizer,
        )

        run_streaming(
            DeviceStreamingRecognizer(smodel, svars["params"],
                                      extra_vars=sextra, search="greedy",
                                      max_steps=steps_cap),
            "streaming-greedy(device)")
        run_streaming(
            DeviceStreamingRecognizer(smodel, svars["params"],
                                      extra_vars=sextra, search="beam",
                                      beam_size=10, ctc_weight=0.3,
                                      max_steps=steps_cap),
            "streaming-beam10(device)")

        from espnet_tpu.decode.streaming_inference import Speech2TextStreaming

        run_streaming(
            Speech2TextStreaming(smodel, svars["params"],
                                 extra_vars=sextra, search="greedy",
                                 max_steps=steps_cap),
            "streaming-greedy(host,r4)", reps=1)
    except Exception as e:  # keep the offline table even if streaming fails
        print(f"# streaming RTF failed: {e}", file=sys.stderr)

    print("\n| mode | beam | batch | RTF |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r.get('beam', '-')} | "
              f"{r.get('batch', '-')} | {r['rtf']} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
