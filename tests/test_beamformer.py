"""WPE + MVDR beamformer: op correctness and module forward/backward.

Reference analogue: `test/espnet2/enh/layers/test_beamformer.py`,
`test_dnn_beamformer.py`, `test_dnn_wpe.py` (tiny shapes, finite
loss/grad) plus analytic sanity checks of the linear algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_psd_matrix_matches_numpy():
    from espnet_tpu.ops.beamformer import psd_matrix

    rng = np.random.RandomState(0)
    y = rng.randn(2, 3, 4, 10) + 1j * rng.randn(2, 3, 4, 10)
    mask = rng.rand(2, 3, 10)
    got = np.asarray(psd_matrix(jnp.asarray(y), jnp.asarray(mask)))
    want = np.einsum("bfct,bfdt->bfcd", y * mask[:, :, None],
                     y.conj()) / mask.sum(-1)[:, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mvdr_distortionless_rank1():
    """With Phi_n = I and Phi_s = d d^H, Souden MVDR satisfies
    w^H d = d[ref] (target passes as observed at the ref channel)."""
    from espnet_tpu.ops.beamformer import mvdr_weights

    rng = np.random.RandomState(1)
    c = 4
    d = rng.randn(1, 2, c) + 1j * rng.randn(1, 2, c)  # (B=1, F=2, C)
    psd_s = jnp.asarray(np.einsum("bfc,bfd->bfcd", d, d.conj()))
    psd_n = jnp.broadcast_to(jnp.eye(c, dtype=psd_s.dtype), psd_s.shape)
    u = jnp.zeros((1, c)).at[:, 0].set(1.0)
    w = np.asarray(mvdr_weights(psd_s, psd_n, u, eps=0.0))
    got = np.einsum("bfc,bfc->bf", w.conj(), d)
    np.testing.assert_allclose(got, d[..., 0], rtol=1e-4, atol=1e-5)


def test_mvdr_suppresses_interferer():
    """Two point sources with random steering: MVDR output should carry
    the target with far less interference than the raw ref channel."""
    from espnet_tpu.ops.beamformer import (
        apply_beamformer, mvdr_weights, psd_matrix,
    )

    rng = np.random.RandomState(2)
    b, f, c, t = 1, 5, 4, 200
    d_s = rng.randn(b, f, c) + 1j * rng.randn(b, f, c)
    d_i = rng.randn(b, f, c) + 1j * rng.randn(b, f, c)
    s = rng.randn(b, f, t) + 1j * rng.randn(b, f, t)
    i = rng.randn(b, f, t) + 1j * rng.randn(b, f, t)
    noise = 0.01 * (rng.randn(b, f, c, t) + 1j * rng.randn(b, f, c, t))
    y = (d_s[..., None] * s[..., None, :]
         + d_i[..., None] * i[..., None, :] + noise)
    # oracle masks from source dominance
    ms = jnp.asarray((np.abs(s) ** 2 > np.abs(i) ** 2).astype(np.float64))
    psd_s = psd_matrix(jnp.asarray(y), ms)
    psd_n = psd_matrix(jnp.asarray(y), 1.0 - ms)
    u = jnp.zeros((b, c)).at[:, 0].set(1.0)
    w = mvdr_weights(psd_s, psd_n, u)
    out = np.asarray(apply_beamformer(w, jnp.asarray(y)))

    def leak(x):
        # interference energy relative to target energy via projections
        a_s = np.abs(np.einsum("bft,bft->bf", x, s.conj())) ** 2
        a_i = np.abs(np.einsum("bft,bft->bf", x, i.conj())) ** 2
        return (a_i / a_s).mean()

    raw = y[:, :, 0, :]
    assert leak(out) < 0.5 * leak(raw)


def test_wpe_removes_late_reverb():
    from espnet_tpu.ops.beamformer import wpe

    rng = np.random.RandomState(3)
    b, f, c, t = 1, 4, 2, 400
    s = rng.randn(b, f, c, t) + 1j * rng.randn(b, f, c, t)
    # late reverberation at lag 4; predicting the tail from y needs the
    # IIR expansion 0.5*y(t-4) - 0.25*y(t-8) + ... so taps must cover
    # several multiples of the lag (delay=3, taps=7 covers lags 3..9)
    rev = np.zeros_like(s)
    rev[..., 4:] = 0.5 * s[..., :-4]
    y = s + rev
    x = np.asarray(wpe(jnp.asarray(y), taps=7, delay=3, iterations=3))
    err_before = np.mean(np.abs(y - s) ** 2)
    err_after = np.mean(np.abs(x - s) ** 2)
    assert err_after < 0.3 * err_before


@pytest.mark.parametrize("use_wpe", [False, True])
def test_beamformer_separator_forward_backward(use_wpe):
    from espnet_tpu.models.enh import EnhancementModel, EnhConfig

    cfg = EnhConfig(
        num_spk=1, separator_type="beamformer", n_fft=64, hop_length=32,
        use_wpe=use_wpe, wpe_taps=3, wpe_delay=2, bf_hidden=8, bf_layers=1,
    )
    model = EnhancementModel(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 800, 3))  # (B, n, C)
    lens = jnp.array([800, 600])
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 800, 1))
    params = model.init(rng, mix, lens, ref)
    loss, stats = model.apply(params, mix, lens, ref)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, mix, lens, ref)[0])(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0
    est, others = model.apply(params, mix, lens,
                              method=EnhancementModel.forward_enhance)
    assert est.shape == (2, 1, 800)
    assert "mask_spk1" in others


def test_gcc_phat_tdoa_recovers_known_delays():
    from espnet_tpu.ops.beamformer import gcc_phat_tdoa

    rng = np.random.RandomState(0)
    src = rng.randn(8000).astype(np.float32)
    for true in [0, 7, -13, 40]:
        delayed = np.roll(src, true)
        est = int(gcc_phat_tdoa(jnp.asarray(src), jnp.asarray(delayed),
                                max_delay=100))
        assert est == true, (true, est)


def test_delay_and_sum_beats_single_channel():
    """Synthetic 4-mic scene: DS output SNR > best single channel SNR."""
    from espnet_tpu.ops.beamformer import delay_and_sum

    rng = np.random.RandomState(1)
    t = np.arange(8000) / 16000.0
    src = (np.sin(2 * np.pi * 440 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    delays = [0, 5, -9, 14]
    chans = np.stack([
        np.roll(src, d) + 0.4 * rng.randn(len(src)).astype(np.float32)
        for d in delays
    ])
    out = np.asarray(delay_and_sum(jnp.asarray(chans), max_delay=50))

    def snr(est):
        n = est - src
        return 10 * np.log10((src ** 2).sum() / (n ** 2).sum())

    best_single = max(snr(np.roll(chans[i], -delays[i]))
                      for i in range(len(delays)))
    # 4 mics of equal noise -> ~6 dB array gain; require a solid margin
    assert snr(out) > best_single + 3.0


def test_delay_and_sum_downweights_bad_channel():
    from espnet_tpu.ops.beamformer import delay_and_sum

    rng = np.random.RandomState(2)
    t = np.arange(8000) / 16000.0
    src = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    good = np.stack([src + 0.1 * rng.randn(len(src)).astype(np.float32)
                     for _ in range(3)])
    dead = rng.randn(len(src)).astype(np.float32)  # no signal at all
    chans = np.concatenate([good, dead[None]], axis=0)
    w_out = np.asarray(delay_and_sum(jnp.asarray(chans)))
    p_out = np.asarray(delay_and_sum(jnp.asarray(chans), weighted=False))

    def err(est):
        return float(((est - src) ** 2).sum())

    assert err(w_out) < err(p_out)  # quality weighting helps
