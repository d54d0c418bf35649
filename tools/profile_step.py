"""Component-level timing of the bench train step on the real chip.

Times (compile, steady-state run) for each stage of the flagship conformer
ASR model in isolation — frontend, encoder fwd, encoder fwd+bwd, CTC loss
fwd+bwd, decoder fwd+bwd, full loss fwd+bwd, full train step — so the MFU
gap can be attributed to a specific stage instead of guessed at.

Usage: python tools/profile_step.py [--batch 32] [--secs 15]
Prints one human table + one JSON line for committing into PROFILE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

FS = 16000


def _log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def timeit(fn, args, n=10, name=""):
    """Returns (compile_s, per_call_s). Forces a host fetch to drain."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    per = (time.perf_counter() - t0) / n
    _log(f"{name:28s} compile {compile_s:7.1f}s  run {per * 1e3:8.2f} ms")
    return compile_s, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from espnet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from espnet_tpu.models.asr import ASRConfig, ASRModel
    from espnet_tpu.train.optim import build_optimizer
    from espnet_tpu.train.steps import TrainState, make_train_step

    cfg = ASRConfig(
        vocab_size=5000, input_type="raw", n_mels=80, use_specaug=True,
        normalize="utterance_mvn", encoder_type="conformer", d_model=256,
        num_heads=4, d_ff=2048, num_encoder_layers=12, num_decoder_layers=6,
        decoder_d_ff=2048, ctc_weight=0.3, dtype=jnp.bfloat16,
        remat_encoder=args.remat,
    )
    model = ASRModel(cfg)
    b, samples, u = args.batch, int(args.secs * FS), 40
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(b, samples).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((b,), samples, jnp.int32),
        "text": jnp.asarray(
            rng.randint(1, cfg.vocab_size - 1, (b, u)).astype(np.int32)),
        "text_lengths": jnp.full((b,), u, jnp.int32),
    }
    _log(f"devices: {jax.devices()} batch={b} secs={args.secs}")
    tiny = (batch["speech"][:1], batch["speech_lengths"][:1],
            batch["text"][:1], batch["text_lengths"][:1])
    variables = nn.meta.unbox(
        jax.jit(model.init, static_argnums=(5,))(
            jax.random.PRNGKey(0), *tiny, True))
    variables = jax.block_until_ready(variables)
    params = variables["params"]
    _log("init done")
    key = jax.random.key(1, impl="rbg")
    results = {}

    # --- frontend only (log-mel + specaug + mvn) ---
    @jax.jit
    def frontend(params, speech, lens, key):
        return model.apply(
            {"params": params}, speech, lens, False,
            method=lambda m, s, l, det: m._frontend(s, l, det),
            rngs={"specaug": key})

    results["frontend_fwd"] = timeit(
        frontend, (params, batch["speech"], batch["speech_lengths"], key),
        args.n, "frontend fwd")
    feats, feat_lens = frontend(
        params, batch["speech"], batch["speech_lengths"], key)
    feats = jax.block_until_ready(feats)
    _log(f"feats {feats.shape} {feats.dtype}")

    # --- encoder fwd only (from features) ---
    @jax.jit
    def enc_fwd(params, feats, feat_lens, key):
        out = model.apply(
            {"params": params}, feats, feat_lens, False,
            method=lambda m, f, l, det: m.encoder(f, l, det),
            rngs={"dropout": key})
        return out[0], out[1]

    results["encoder_fwd"] = timeit(
        enc_fwd, (params, feats, feat_lens, key), args.n, "encoder fwd")
    enc, enc_lens = enc_fwd(params, feats, feat_lens, key)
    enc = jax.block_until_ready(enc)
    _log(f"enc {enc.shape} {enc.dtype}")

    # --- encoder fwd+bwd ---
    @jax.jit
    def enc_grad(params, feats, feat_lens, key):
        def loss(p):
            out = model.apply(
                {"params": p}, feats, feat_lens, False,
                method=lambda m, f, l, det: m.encoder(f, l, det),
                rngs={"dropout": key})
            return jnp.sum(out[0].astype(jnp.float32) ** 2)
        return jax.grad(loss)(params)

    results["encoder_fwd_bwd"] = timeit(
        enc_grad, (params, feats, feat_lens, key), args.n, "encoder fwd+bwd")

    # --- CTC head + loss fwd+bwd (from encoder output) ---
    @jax.jit
    def ctc_grad(params, enc, enc_lens, text, text_lens):
        def loss(p, e):
            from espnet_tpu.ops.ctc import ctc_loss
            logits = model.apply(
                {"params": p}, e,
                method=lambda m, x: m.ctc_head(x))
            return ctc_loss(logits, text, enc_lens, text_lens, 0)
        return jax.grad(loss, argnums=(0, 1))(params, enc)

    results["ctc_fwd_bwd"] = timeit(
        ctc_grad,
        (params, enc, enc_lens, batch["text"], batch["text_lengths"]),
        args.n, "ctc head+loss fwd+bwd")

    # --- decoder + att loss fwd+bwd ---
    @jax.jit
    def dec_grad(params, enc, enc_lens, text, text_lens, key):
        def loss(p, e):
            from espnet_tpu.models.asr import add_sos_eos
            from espnet_tpu.ops.losses import label_smoothing_loss
            from espnet_tpu.ops.masks import make_valid_mask
            ys_in, ys_out, ys_lens = add_sos_eos(text, text_lens, 4999, 4999)
            logits = model.apply(
                {"params": p}, ys_in, ys_lens, e, enc_lens, False,
                method=lambda m, a, b_, c_, d_, det: m.decoder(
                    a, b_, c_, d_, det),
                rngs={"dropout": key})
            valid = make_valid_mask(ys_lens, ys_in.shape[1])
            return label_smoothing_loss(logits, ys_out, valid, 0.1)
        return jax.grad(loss, argnums=(0, 1))(params, enc)

    results["decoder_fwd_bwd"] = timeit(
        dec_grad,
        (params, enc, enc_lens, batch["text"], batch["text_lengths"], key),
        args.n, "decoder+attloss fwd+bwd")

    # --- full loss fwd+bwd ---
    @jax.jit
    def full_grad(params, batch, key):
        def loss(p):
            out = model.apply(
                {"params": p}, batch["speech"], batch["speech_lengths"],
                batch["text"], batch["text_lengths"], False,
                rngs={"dropout": key, "specaug": jax.random.fold_in(key, 1)})
            return out[0]
        return jax.grad(loss)(params)

    results["full_fwd_bwd"] = timeit(
        full_grad, (params, batch, key), args.n, "full loss fwd+bwd")

    # --- full train step (incl. optimizer) ---
    tx = build_optimizer("adam", lr=2e-3, schedule="warmuplr",
                         warmup_steps=25000, d_model=cfg.d_model)
    train_step = make_train_step(model, tx, donate=False)
    state = TrainState.create(
        params, tx, {k: v for k, v in variables.items() if k != "params"})
    results["train_step"] = timeit(
        train_step, (state, batch, key), args.n, "full train step")

    print(json.dumps({
        k: {"compile_s": round(c, 1), "run_ms": round(r * 1e3, 2)}
        for k, (c, r) in results.items()
    }))


if __name__ == "__main__":
    main()
