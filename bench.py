"""Training-throughput benchmark on the flagship conformer ASR model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: training audio-seconds per wall-second on one chip (how many
seconds of 16 kHz speech the train step consumes per second), measured on
a LibriSpeech-100-scale conformer (12x256 encoder, 6x256 decoder, joint
CTC/attention, bf16 compute) at steady state.

vs_baseline: the reference publishes no speed numbers (SURVEY §6 — accuracy
only), so the denominator is our documented estimate of the reference
recipe's single-GPU throughput: ESPnet2 conformer-12L LibriSpeech training
at batch_bins-equivalent load runs ~1.2 s/step for ~8 min of audio per step
on one V100 => ~400 audio-seconds/s. This is an estimate, recorded here so
the ratio is at least stable across rounds.

vs_torch_cpu_measured: a MEASURED same-model denominator (round 4): the
reference's own `e2e_asr_conformer.E2E` at the bench geometry trains at
13.63 audio-s/s on this machine's torch CPU (2 threads, batch 4 x 15 s;
`tools/bench_reference_torch.py`). Different hardware class — the ratio
quantifies chip-vs-host, not framework-vs-framework — but it is measured,
not invented.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

BASELINE_AUDIO_SEC_PER_S = 400.0
# tools/bench_reference_torch.py on this machine (torch CPU, 2 threads)
REFERENCE_TORCH_CPU_AUDIO_SEC_PER_S = 13.63
FS = 16000


def _conv_out(t, k=3, s=2):
    return (t - k) // s + 1


def _analytic_train_flops(cfg, b, samples, u, n_fft=512, hop=128):
    """Analytic matmul/conv FLOPs of one train step (fwd + 2x bwd).

    Counts multiply-adds as 2 FLOPs over every GEMM/conv in the model at
    the bench shapes; elementwise/norm/softmax/optimizer work is excluded
    (standard MFU convention). The frontend (log-mel) has no parameters and
    autodiff stops there, so it counts forward-only.
    """
    d, dff, h = cfg.d_model, cfg.d_ff, cfg.num_heads
    dh = d // h
    v = cfg.vocab_size
    f = cfg.n_mels
    t0 = samples // hop + 1              # stft frames (center-padded)
    t1, f1 = _conv_out(t0), _conv_out(f)     # subsample conv0 (3,2)
    t, f2 = _conv_out(t1), _conv_out(f1)     # subsample conv1 (3,2)

    fwd = 0.0
    # frontend (forward-only): DFT-as-matmul (re+im) + mel projection
    frontend = b * t0 * n_fft * 2 * (n_fft // 2 + 1) * 2 \
        + b * t0 * (n_fft // 2 + 1) * f * 2
    # conv2d subsampling (x4) + flatten projection
    fwd += b * t1 * f1 * d * (3 * 3 * 1) * 2
    fwd += b * t * f2 * d * (3 * 3 * d) * 2
    fwd += b * t * (f2 * d) * d * 2
    # encoder blocks
    attn = (4 * b * t * d * d * 2              # q/k/v/out projections
            + (2 * t - 1) * d * d * 2          # rel-pos projection (no B)
            + b * h * t * t * dh * 2 * 2       # content scores + AV
            + b * h * t * (2 * t - 1) * dh * 2)  # pos scores (pre-skew)
    conv_mod = b * t * d * (2 * d) * 2 + b * t * d * 31 * 2 \
        + b * t * d * d * 2
    ffn = 2 * (b * t * d * dff * 2)            # two GEMMs
    fwd += cfg.num_encoder_layers * (attn + conv_mod + 2 * ffn)
    # decoder blocks
    dec_ffn = 2 * (b * u * d * dff * 2)
    dec_attn = (4 * b * u * d * d * 2          # self q/k/v/out
                + b * h * u * u * dh * 2 * 2   # self scores + AV
                + 2 * b * u * d * d * 2        # cross q/out
                + 2 * b * t * d * d * 2        # cross k/v
                + b * h * u * t * dh * 2 * 2)  # cross scores + AV
    fwd += cfg.num_decoder_layers * (dec_attn + dec_ffn)
    fwd += b * u * d * v * 2                   # decoder output projection
    fwd += b * t * d * v * 2                   # CTC head
    return 3.0 * fwd + frontend


def _init_args(cfg):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(1, FS).astype(np.float32)),
        jnp.asarray([FS], np.int32),
        jnp.asarray(rng.randint(1, cfg.vocab_size - 1, (1, 4)).astype(np.int32)),
        jnp.asarray([4], np.int32),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    # defaults are the best config of the round-4 batch sweep: with the
    # fused FFN/prenorm kernels and flat adam, b64 scales (134.1 ms/step =
    # 35.8% MFU vs b32's 70.8 ms = 33.9%); r3's b64 was flat at 26.7%
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from espnet_tpu.utils.jax_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    _log(f"compilation cache: {cache_dir}")

    from espnet_tpu.models.asr import ASRConfig, ASRModel
    from espnet_tpu.train.optim import build_optimizer
    from espnet_tpu.train.steps import TrainState, make_train_step

    cfg = ASRConfig(
        vocab_size=5000,
        input_type="raw",
        n_mels=80,
        use_specaug=True,
        normalize="utterance_mvn",
        encoder_type="conformer",
        d_model=256,
        num_heads=4,
        d_ff=2048,
        num_encoder_layers=12,
        num_decoder_layers=6,
        decoder_d_ff=2048,
        ctc_weight=0.3,
        dtype=jnp.bfloat16,
        remat_encoder=args.remat,
        scan_encoder_layers=args.scan_layers,
    )
    model = ASRModel(cfg)
    # fused_adam + flat params: the generic optax chain costs ~10.5 ms on
    # this model; the one-pass flat update is 3.7 ms (see train/optim.py)
    tx = build_optimizer("fused_adam", lr=2e-3, schedule="warmuplr",
                         warmup_steps=25000, d_model=cfg.d_model)

    b, secs, u = args.batch, args.secs, 40
    samples = int(secs * FS)
    rng = np.random.RandomState(0)
    batch = {
        "speech": rng.randn(b, samples).astype(np.float32) * 0.1,
        "speech_lengths": np.full((b,), samples, np.int32),
        "text": rng.randint(1, cfg.vocab_size - 1, (b, u)).astype(np.int32),
        "text_lengths": np.full((b,), u, np.int32),
    }
    import flax.linen as nn

    # init on a tiny batch (params are shape-independent) and under jit —
    # eager init dispatches op-by-op and takes minutes on a remote TPU.
    _log(f"devices: {jax.devices()}")
    tiny = _init_args(cfg)
    t0 = time.perf_counter()
    variables = nn.meta.unbox(
        jax.jit(model.init, static_argnums=(5,))(
            jax.random.PRNGKey(0), *tiny, True
        )
    )
    variables = jax.block_until_ready(variables)
    _log(f"init done in {time.perf_counter() - t0:.1f}s")
    from jax.flatten_util import ravel_pytree

    flat_params, unravel = ravel_pytree(variables["params"])
    train_step = make_train_step(model, tx, unravel=unravel)
    state = TrainState.create(
        flat_params, tx,
        {k: v for k, v in variables.items() if k != "params"},
    )
    device_batch = {
        k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()
    }
    # rbg keys: much cheaper per random bit on TPU than threefry (the
    # trainer uses the same impl, train/trainer.py)
    key = jax.random.key(1, impl="rbg")

    # warmup / compile.  NOTE (round-1 verdict): on the experimental 'axon'
    # platform jax.block_until_ready returns before execution finishes, so
    # all timing windows are closed by a forced host scalar fetch of the
    # final step's loss — the steps chain through `state`, so fetching the
    # last loss waits for the whole window.
    t0 = time.perf_counter()
    state, stats = train_step(state, device_batch, key)
    loss0 = float(jax.device_get(stats["loss"]))
    _log(f"train step compiled+run in {time.perf_counter() - t0:.1f}s "
         f"(loss={loss0:.3f})")

    # Model FLOPs per step: ANALYTIC matmul/conv count (fwd + 2x bwd).
    # Rounds 1-3 used compiled-HLO cost_analysis, but XLA reports 0 FLOPs
    # inside custom calls, so every op moved into a Pallas kernel silently
    # vanished from the numerator (r3's 28.8% "MFU" excluded attention+CTC;
    # with the FFN also fused the HLO number collapses to ~45% of the real
    # work). The analytic count below is kernel-placement-invariant and is
    # the standard MFU convention (matmul/conv FLOPs only; elementwise,
    # norm, softmax and optimizer excluded).
    model_flops = _analytic_train_flops(cfg, b, samples, u)
    xla_flops = None
    try:
        cost = train_step.lower(state, device_batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0)) or None
        _log(f"flops: analytic {model_flops:.3e}, "
             f"XLA-visible {xla_flops:.3e}")
    except Exception as e:  # pragma: no cover - platform dependent
        _log(f"cost_analysis unavailable: {e}")

    def timed_window(n):
        t0 = time.perf_counter()
        nonlocal state, stats
        for _ in range(n):
            state, stats = train_step(state, device_batch, key)
        _ = float(jax.device_get(stats["loss"]))  # force full drain
        return time.perf_counter() - t0

    timed_window(3)  # settle clocks / caches
    n_steps = args.steps
    dt = timed_window(n_steps)
    step_time = dt / n_steps

    # ---- decode RTF (BASELINE.md measurement point; reference tooling
    # utils/calculate_rtf.py:16-107 = total decode wall / total audio) ----
    # Joint CTC/attention batched beam search, beam 10, on 15 s utterances.
    # The label budget is capped at 150 steps (~10 tokens/s of speech —
    # generous for any real transcript); with untrained random weights the
    # search would otherwise never emit <eos> and run to the encoder-length
    # worst case, which no trained model hits.
    decode_rtf = None
    dec_b, dec_steps, dec_reps = 8, 150, 3
    try:
        from espnet_tpu.decode.asr_inference import Speech2Text

        s2t = Speech2Text(
            model, unravel(state.params),
            extra_vars=state.extra_vars,
            beam_size=10, ctc_weight=0.3, max_steps=dec_steps,
        )
        dec_speech = np.asarray(batch["speech"][:dec_b])
        dec_lens = np.asarray(batch["speech_lengths"][:dec_b])
        t0 = time.perf_counter()
        s2t(dec_speech, dec_lens)  # compile + warmup (results host-fetched)
        _log(f"decode compiled+run in {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(dec_reps):
            s2t(dec_speech, dec_lens)
        dec_dt = time.perf_counter() - t0
        decode_rtf = dec_dt / (dec_reps * float(dec_lens.sum()) / FS)
        _log(f"decode RTF {decode_rtf:.4f}")
    except Exception as e:  # pragma: no cover - keep the train metric alive
        _log(f"decode bench failed: {e}")

    # bf16 peak: TPU v5e ("v5 lite") = 197 TFLOP/s; v4 = 275; v5p = 459.
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if "v5 lite" in kind or "v5e" in kind else (
        275e12 if "v4" in kind else 459e12 if "v5p" in kind else 197e12)
    mfu = (model_flops / step_time / peak) if model_flops else None

    audio_seconds = float(np.sum(batch["speech_lengths"])) / FS * n_steps
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "train_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
        "vs_torch_cpu_measured": round(
            value / REFERENCE_TORCH_CPU_AUDIO_SEC_PER_S, 1),
        "step_time_s": round(step_time, 4),
        "model_flops": model_flops,
        "mfu": round(mfu, 4) if mfu else None,
        # Both numerators recorded (round-4 advisor): "mfu" is the analytic
        # matmul/conv count (kernel-placement-invariant, the r4+ headline);
        # "mfu_xla_visible" is compiled-HLO cost_analysis, the r1-r3
        # methodology, which under-counts because custom calls report 0
        # FLOPs. Cross-round comparisons vs r1-r3 should use the latter.
        "mfu_xla_visible": (round(xla_flops / step_time / peak, 4)
                            if xla_flops else None),
        "xla_visible_flops": xla_flops,
        "peak_flops": peak,
        "config": (f"conformer12x256-dec6 bf16 b{b}x{secs:g}s"
                   + ("+remat" if args.remat else "")
                   + ("+scan" if args.scan_layers else "")),
        "decode_rtf": round(decode_rtf, 5) if decode_rtf else None,
        "decode_config": f"beam10 ctc0.3 b{dec_b} cap{dec_steps}steps",
        "device": str(jax.devices()[0]),
        "loss": float(jax.device_get(stats["loss"])),
    }))


if __name__ == "__main__":
    main()
