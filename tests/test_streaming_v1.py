"""v1 window/segment streaming wrappers.

Reference analogue: `espnet/nets/pytorch_backend/streaming/{window,segment}.py`
driven as in `test/test_e2e_asr.py` streaming cases.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.decode.asr_inference import Speech2Text
from espnet_tpu.models.asr import ASRConfig, ASRModel


@pytest.fixture(scope="module")
def s2t():
    cfg = ASRConfig(
        vocab_size=12,
        input_type="raw",
        n_mels=20,
        use_specaug=False,
        normalize="utterance_mvn",
        encoder_type="vgg_lstm",
        d_model=16,
        num_heads=2,
        d_ff=32,
        num_encoder_layers=2,
        num_decoder_layers=1,
        decoder_d_ff=32,
        dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    variables = nn.meta.unbox(model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, 1600), jnp.float32),
        jnp.asarray([1600], jnp.int32),
        jnp.asarray([[1, 2]], jnp.int32),
        jnp.asarray([2], jnp.int32),
        True,
    ))
    return Speech2Text(
        model, variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        beam_size=2, ctc_weight=0.3, max_steps=8,
    )


def test_window_streaming_single_chunk_matches_offline(s2t):
    """One window == the whole utterance must reproduce offline decoding
    exactly (same zero initial LSTM carry, same search program)."""
    from espnet_tpu.decode.streaming_v1 import WindowStreamingASR

    rng = np.random.RandomState(1)
    wav = rng.randn(4800).astype(np.float32) * 0.1

    offline = s2t(wav[None], np.asarray([4800], np.int32))[0]

    ws = WindowStreamingASR(s2t)
    ws.accept_input(wav)
    hyps = ws.decode_with_attention_offline()
    assert hyps[0][0] == offline.token_ids
    np.testing.assert_allclose(hyps[0][1], offline.score, rtol=1e-4)


def test_window_streaming_multi_chunk_runs(s2t):
    from espnet_tpu.decode.streaming_v1 import WindowStreamingASR

    rng = np.random.RandomState(2)
    ws = WindowStreamingASR(s2t)
    for _ in range(3):
        ws.accept_input(rng.randn(1600).astype(np.float32) * 0.1)
    hyps = ws.decode_with_attention_offline()
    assert len(hyps) == 2  # beam_size hypotheses
    assert all(isinstance(i, int) for i in hyps[0][0])
    assert isinstance(ws.hypothesis_text(), str)


def test_encoder_carry_advances(s2t):
    """The carried LSTM state must actually influence the next chunk."""
    from espnet_tpu.decode.streaming_v1 import _ChunkEncoder

    rng = np.random.RandomState(3)
    wav = rng.randn(1600).astype(np.float32) * 0.1
    ce = _ChunkEncoder(s2t)
    a, _ = ce.encode_chunk(wav)      # from zero carry
    b, _ = ce.encode_chunk(wav)      # from advanced carry
    assert not np.allclose(a, b)
    ce.reset_carry()
    c, _ = ce.encode_chunk(wav)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5)


class _FakeEnc:
    """Deterministic chunk encoder stub: the per-frame CTC argmax is driven
    by the chunk's first sample (1 -> token, 0 -> blank)."""

    def __init__(self):
        self.reset_calls = 0
        self.decoded = []

    def encode_chunk(self, samples):
        active = samples[0] > 0.5
        t, v = 2, 4
        lp = np.full((t, v), -5.0, np.float32)
        lp[:, 2 if active else 0] = -0.01
        return np.ones((t, 8), np.float32), lp

    def reset_carry(self):
        self.reset_calls += 1

    def decode_memory(self, enc, lp):
        self.decoded.append(enc.shape[0])
        return [([2], -1.0)]

    def ids_to_text(self, ids):
        return "x" * len(ids)


def test_segment_streaming_endpointing(s2t):
    """Onset -> re-run from zero state; endpoint after min_blank_dur blank
    frames -> one decoded segment, state reset (`segment.py:42`)."""
    from espnet_tpu.decode.streaming_v1 import SegmentStreamingASR

    ss = SegmentStreamingASR(s2t, min_blank_dur=3, onset_margin=2,
                             offset_margin=1)
    fake = _FakeEnc()
    ss._enc = fake

    speech = np.ones(320, np.float32)
    silence = np.zeros(320, np.float32)

    assert ss.accept_input(silence) is None          # idle: no onset
    assert not ss._activated
    assert ss.accept_input(speech) is None           # onset, no endpoint
    assert ss._activated
    assert fake.reset_calls == 1                     # zero-state re-run
    assert ss.accept_input(speech) is None
    hyp = ss.accept_input(silence)                   # blank run 2 < 3
    assert hyp is None
    hyp = ss.accept_input(silence)                   # blank run 4 >= 3
    assert hyp == [([2], -1.0)]
    assert not ss._activated and ss._encoder_states == []
    # decoded segment length = total - blank_dur + offset_margin
    assert fake.decoded == [8 - 4 + 1]
