"""Device-resident streaming recognizer (decode/streaming_device.py).

Parity contract (reference `espnet2/bin/asr_inference_streaming.py`
semantics, rebuilt device-resident): the chunked streaming result must
equal the offline (train-parallel blockwise) result exactly — greedy
against offline CTC greedy, beam against the offline batched beam search —
while every rolling buffer stays on the device and each quantum costs one
jitted dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import ASRConfig, ASRModel


def _cfg(**kw):
    base = dict(
        vocab_size=8, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, use_specaug=False, normalize="none",
        encoder_type="contextual_block_conformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=2,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        block_size=8, stream_hop_size=4, look_ahead=2, dropout_rate=0.0,
        ctc_weight=0.5,
    )
    base.update(kw)
    return ASRConfig(**base)


def _model_and_wave(cfg, n, seed=0):
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(seed)
    speech = jax.random.normal(rng, (1, n)) * 0.3
    params = model.init(
        rng, speech, jnp.asarray([n]),
        jnp.array([[1, 2]], jnp.int32), jnp.asarray([2]), True,
    )
    return model, params, speech


def _offline_greedy_ids(model, params, speech, n):
    enc, elen = model.apply(params, speech, jnp.asarray([n]),
                            method=ASRModel.encode)
    lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    toks = np.asarray(jnp.argmax(lp, -1))[0][: int(elen[0])]
    ids, prev = [], 0
    for t in toks:
        t = int(t)
        if t != 0 and t != prev:
            ids.append(t)
        prev = t
    return ids


@pytest.mark.parametrize("chunk", [1600, 2048, 4000])
def test_device_streaming_greedy_matches_offline(chunk):
    from espnet_tpu.decode.streaming_device import DeviceStreamingRecognizer

    cfg = _cfg()
    n = 3 * 16000 // 4
    model, params, speech = _model_and_wave(cfg, n)
    ref_ids = _offline_greedy_ids(model, params, speech, n)

    s2t = DeviceStreamingRecognizer(model, params["params"])
    wave = np.asarray(speech[0])
    out = None
    for i in range(0, len(wave), chunk):
        last = i + chunk >= len(wave)
        out = s2t(wave[i:i + chunk], is_final=last)
    assert out["is_final"]
    assert out["token_ids"] == ref_ids, (out["token_ids"], ref_ids)


def test_device_streaming_short_utterance():
    from espnet_tpu.decode.streaming_device import DeviceStreamingRecognizer

    cfg = _cfg(block_size=40, stream_hop_size=16, look_ahead=16)
    n = 4000  # 0.25 s -> subsampled length << block_size
    model, params, speech = _model_and_wave(cfg, n, seed=1)
    ref_ids = _offline_greedy_ids(model, params, speech, n)

    s2t = DeviceStreamingRecognizer(model, params["params"])
    wave = np.asarray(speech[0])
    out = s2t(wave[:1600])
    out = s2t(wave[1600:], is_final=True)
    assert out["token_ids"] == ref_ids


def test_device_streaming_reusable_across_utterances():
    from espnet_tpu.decode.streaming_device import DeviceStreamingRecognizer

    cfg = _cfg()
    n = 3 * 16000 // 4
    model, params, speech = _model_and_wave(cfg, n)
    ref_ids = _offline_greedy_ids(model, params, speech, n)
    s2t = DeviceStreamingRecognizer(model, params["params"])
    wave = np.asarray(speech[0])
    for _ in range(2):  # second utterance reuses compiled steps
        out = None
        for i in range(0, len(wave), 1600):
            last = i + 1600 >= len(wave)
            out = s2t(wave[i:i + 1600], is_final=last)
        assert out["token_ids"] == ref_ids


def test_device_streaming_beam_matches_offline_beam():
    from espnet_tpu.decode.beam_search import (
        BeamSearchConfig, batched_beam_search,
    )
    from espnet_tpu.decode.streaming_device import DeviceStreamingRecognizer

    cfg = _cfg()
    n = 3 * 16000 // 4
    model, params, speech = _model_and_wave(cfg, n)

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

    yseq, ylen, _ = batched_beam_search(
        bcfg, cfg.sos_id, cfg.eos_id, cfg.vocab_size, elen, att_score_fn,
        att_cache, ctc_log_probs=lp_pad, max_steps=msteps,
    )
    ref_ids = [int(t) for t in np.asarray(yseq[0, 0, : int(ylen[0, 0])])]

    s2t = DeviceStreamingRecognizer(
        model, params["params"], search="beam", beam_size=w,
        ctc_weight=0.5, max_steps=msteps, t_max=t_max,
    )
    wave = np.asarray(speech[0])
    out = None
    for i in range(0, len(wave), 1600):
        last = i + 1600 >= len(wave)
        out = s2t(wave[i:i + 1600], is_final=last)
    assert out["token_ids"] == ref_ids, (out["token_ids"], ref_ids)


def test_device_streaming_state_is_device_resident():
    """The rolling state must be jax arrays (not host numpy) and the
    steady-state step count must be bounded: one compiled step per
    (kind, block?) variant, reused across quanta."""
    from espnet_tpu.decode.streaming_device import DeviceStreamingRecognizer

    cfg = _cfg()
    n = 16000
    model, params, speech = _model_and_wave(cfg, n)
    s2t = DeviceStreamingRecognizer(model, params["params"])
    wave = np.asarray(speech[0])
    for i in range(0, len(wave), 2048):
        s2t(wave[i:i + 2048])
    for k, v in s2t._dev.items():
        leaves = jax.tree_util.tree_leaves(v)
        assert all(isinstance(x, jax.Array) for x in leaves), k
    # compiled-variant count stays small (no per-chunk recompiles)
    assert len(s2t._jit_cache) <= 4
