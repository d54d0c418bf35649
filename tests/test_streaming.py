"""Contextual-block (streaming) conformer encoder tests.

Key property (reference `contextual_block_conformer_encoder.py`: the same
parameters drive `forward_train` and blockwise `forward_infer`): the
train-parallel program and the blockwise-sequential program must produce
identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.streaming import ContextualBlockConformerEncoder


def _enc(**kw):
    base = dict(
        d_model=16, num_heads=2, d_ff=32, num_layers=2, kernel_size=7,
        dropout_rate=0.0, subsampling_factor=4,
        block_size=8, hop_size=4, look_ahead=2,
    )
    base.update(kw)
    return ContextualBlockConformerEncoder(**base)


def test_parallel_blockwise_equivalence():
    enc = _enc()
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 130, 12))
    lens = jnp.array([130, 90])
    params = enc.init(rng, feats, lens)
    y_par, olens = enc.apply(params, feats, lens)
    y_seq, olens2 = enc.apply(params, feats, lens,
                              method=enc.forward_blockwise)
    assert y_par.shape == y_seq.shape
    np.testing.assert_allclose(np.asarray(olens), np.asarray(olens2))
    np.testing.assert_allclose(
        np.asarray(y_par), np.asarray(y_seq), rtol=2e-4, atol=2e-4
    )


def test_short_sequence_path():
    enc = _enc(block_size=64)  # longer than the subsampled sequence
    rng = jax.random.PRNGKey(1)
    feats = jax.random.normal(rng, (2, 60, 12))
    lens = jnp.array([60, 40])
    params = enc.init(rng, feats, lens)
    y, olens = enc.apply(params, feats, lens)
    assert y.shape[0] == 2 and y.shape[2] == 16
    assert bool(jnp.all(jnp.isfinite(y)))


def test_causality_look_ahead():
    """Output frames must not depend on inputs beyond their block's
    look-ahead horizon: perturbing the far future leaves early outputs
    unchanged (the whole point of block processing)."""
    enc = _enc(dropout_rate=0.0)
    rng = jax.random.PRNGKey(2)
    feats = jax.random.normal(rng, (1, 200, 12))
    lens = jnp.array([200])
    params = enc.init(rng, feats, lens)
    y1, _ = enc.apply(params, feats, lens)
    # perturb the last 40 input frames (10 subsampled frames)
    feats2 = feats.at[:, 160:].add(
        jax.random.normal(jax.random.PRNGKey(3), (1, 40, 12))
    )
    y2, _ = enc.apply(params, feats2, lens)
    # first few output frames are produced by block 0 (covers subsampled
    # frames 0..block_size) — far future cannot reach them
    np.testing.assert_allclose(
        np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), rtol=1e-4, atol=1e-4
    )
    # but late frames do change
    assert float(jnp.max(jnp.abs(y1[:, -6:] - y2[:, -6:]))) > 1e-4


def test_gradients_flow():
    enc = _enc()
    rng = jax.random.PRNGKey(4)
    feats = jax.random.normal(rng, (2, 130, 12))
    lens = jnp.array([130, 90])
    params = enc.init(rng, feats, lens)

    def loss(p):
        y, _ = enc.apply(p, feats, lens)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_asr_model_with_streaming_encoder():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=12, input_type="feats", n_mels=12, use_specaug=False,
        normalize="utterance_mvn", encoder_type="contextual_block_conformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=2,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        block_size=8, stream_hop_size=4, look_ahead=2, dropout_rate=0.0,
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 130, 12))
    flens = jnp.array([130, 90])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, feats, flens, text, tlens, True)
    loss, stats = model.apply(params, feats, flens, text, tlens, True)
    assert np.isfinite(float(loss))


def test_streaming_inference_matches_offline():
    """Chunked Speech2TextStreaming must produce exactly the ids that
    offline (full-utterance) blockwise encoding + CTC greedy produces."""
    from espnet_tpu.decode.streaming_inference import Speech2TextStreaming
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=8, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, use_specaug=False, normalize="none",
        encoder_type="contextual_block_conformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=2,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        block_size=8, stream_hop_size=4, look_ahead=2, dropout_rate=0.0,
        ctc_weight=0.5,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    n = 3 * 16000 // 4  # 0.75 s
    speech = jax.random.normal(rng, (1, n)) * 0.3
    params = model.init(
        rng, speech, jnp.asarray([n]),
        jnp.array([[1, 2]], jnp.int32), jnp.asarray([2]), True,
    )

    # offline: parallel blockwise encoder + greedy CTC collapse
    enc, elen = model.apply(params, speech, jnp.asarray([n]),
                            method=ASRModel.encode)
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    toks = np.asarray(jnp.argmax(lp, -1))[0][: int(elen[0])]
    ref_ids, prev = [], 0
    for t in toks:
        t = int(t)
        if t != 0 and t != prev:
            ref_ids.append(t)
        prev = t

    s2t = Speech2TextStreaming(model, params["params"])
    wave = np.asarray(speech[0])
    chunk = 1600  # 100 ms chunks
    out = None
    for i in range(0, len(wave), chunk):
        last = i + chunk >= len(wave)
        out = s2t(wave[i:i + chunk], is_final=last)
    assert out["is_final"]
    assert out["token_ids"] == ref_ids, (out["token_ids"], ref_ids)


def test_streaming_inference_short_utterance():
    from espnet_tpu.decode.streaming_inference import Speech2TextStreaming
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=8, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, use_specaug=False, normalize="none",
        encoder_type="contextual_block_conformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        block_size=40, stream_hop_size=16, look_ahead=16, dropout_rate=0.0,
        ctc_weight=0.5,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(1)
    n = 4000  # short -> single-block fallback
    speech = jax.random.normal(rng, (1, n)) * 0.3
    params = model.init(
        rng, speech, jnp.asarray([n]),
        jnp.array([[1, 2]], jnp.int32), jnp.asarray([2]), True,
    )
    s2t = Speech2TextStreaming(model, params["params"])
    out = s2t(np.asarray(speech[0]), is_final=True)
    assert out["is_final"] and isinstance(out["token_ids"], list)


def test_streaming_beam_search_matches_offline_beam():
    """search="beam": chunked streaming with the block-synchronous online
    beam search; the final 1-best token sequence must equal the offline
    batched beam search run on the (blockwise) encoder output (reference
    `batch_beam_search_online.py` final-block behavior)."""
    from espnet_tpu.decode.beam_search import (
        BeamSearchConfig, batched_beam_search,
    )
    from espnet_tpu.decode.streaming_inference import Speech2TextStreaming
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=8, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, use_specaug=False, normalize="none",
        encoder_type="contextual_block_conformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=2,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        block_size=8, stream_hop_size=4, look_ahead=2, dropout_rate=0.0,
        ctc_weight=0.5,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    n = 3 * 16000 // 4
    speech = jax.random.normal(rng, (1, n)) * 0.3
    params = model.init(
        rng, speech, jnp.asarray([n]),
        jnp.array([[1, 2]], jnp.int32), jnp.asarray([2]), True,
    )

    # offline beam search over the full blockwise encoder output
    enc, elen = model.apply(params, speech, jnp.asarray([n]),
                            method=ASRModel.encode)
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    w, msteps, t_max = 4, 16, 64
    bcfg = BeamSearchConfig(beam_size=w, att_weight=0.5, ctc_weight=0.5,
                            maxlenratio=0.0)
    enc_pad = jnp.pad(enc, ((0, 0), (0, t_max - enc.shape[1]), (0, 0)))
    lp_pad = jnp.pad(lp, ((0, 0), (0, t_max - lp.shape[1]), (0, 0)))
    mem = jnp.repeat(enc_pad, w, axis=0)
    mem_lens = jnp.repeat(elen, w, axis=0)
    att_cache = model.apply(
        params, w, msteps + 1, mem, mem_lens,
        method=type(model).decoder_init_cache,
    )

    def att_score_fn(tokens, pos, cache):
        return model.apply(params, tokens, pos, mem, mem_lens, cache,
                           method=type(model).decoder_score_step)

    yseq, ylen, score = batched_beam_search(
        bcfg, cfg.sos_id, cfg.eos_id, cfg.vocab_size, elen, att_score_fn,
        att_cache, ctc_log_probs=lp_pad, max_steps=msteps,
    )
    ref_ids = [int(t) for t in np.asarray(yseq[0, 0, : int(ylen[0, 0])])]

    s2t = Speech2TextStreaming(
        model, params["params"], search="beam", beam_size=w,
        ctc_weight=0.5, max_steps=msteps, t_max=t_max,
    )
    wave = np.asarray(speech[0])
    chunk = 1600
    out = None
    for i in range(0, len(wave), chunk):
        last = i + chunk >= len(wave)
        out = s2t(wave[i:i + chunk], is_final=last)
    assert out["is_final"]
    assert out["token_ids"] == ref_ids, (out["token_ids"], ref_ids)
