"""VITS: monotonic alignment search, generator forward, KL, inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.tts.vits import (
    VITSConfig, VITSGenerator, maximum_path, vits_kl_loss,
)


def _mas_numpy(value, t_y, t_x):
    """Reference numba algorithm (`monotonic_align/__init__.py:51`)."""
    value = value.copy()
    path = np.zeros_like(value, dtype=np.int32)
    max_neg = -1e9
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = max_neg if x == y else value[y - 1, x]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg
            else:
                v_prev = value[y - 1, x - 1]
            value[y, x] += max(v_prev, v_cur)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[y, index] = 1
        if index != 0 and (
            index == y or value[y - 1, index] < value[y - 1, index - 1]
        ):
            index -= 1
    return path


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_maximum_path_matches_reference(seed):
    rng = np.random.RandomState(seed)
    b, t_y, t_x = 3, 12, 5
    value = rng.randn(b, t_y, t_x).astype(np.float32)
    feat_lens = np.array([12, 9, 6], np.int32)
    text_lens = np.array([5, 3, 2], np.int32)
    path = np.asarray(maximum_path(
        jnp.asarray(value), jnp.asarray(feat_lens), jnp.asarray(text_lens)
    ))
    for i in range(b):
        ref = _mas_numpy(value[i], int(feat_lens[i]), int(text_lens[i]))
        np.testing.assert_array_equal(
            path[i, : feat_lens[i], : text_lens[i]],
            ref[: feat_lens[i], : text_lens[i]], err_msg=f"utt {i}"
        )
        # monotonic + full coverage properties
        durs = path[i, : feat_lens[i], : text_lens[i]].sum(0)
        assert durs.sum() == feat_lens[i]
        assert (durs >= 1).all()


def _tiny_cfg():
    return VITSConfig(
        vocab_size=12, channels=8, text_heads=2, text_d_ff=16, text_layers=1,
        spec_dim=33, posterior_layers=2, flows=2, flow_layers=1,
        decoder_channels=16, upsample_scales=(4, 2),
        resblock_kernel_sizes=(3,), n_fft=64, hop_length=8,
        segment_frames=8, dropout_rate=0.0,
    )


def test_vits_generator_forward_and_losses():
    cfg = _tiny_cfg()
    gen = VITSGenerator(cfg)
    rng = jax.random.PRNGKey(0)
    b, tx, ty = 2, 6, 40
    tokens = jax.random.randint(rng, (b, tx), 1, 12)
    tlens = jnp.array([6, 4])
    spec = jax.random.normal(jax.random.PRNGKey(1), (b, ty, 33)) ** 2
    slens = jnp.array([40, 30])
    rngs = {"params": rng, "posterior": jax.random.PRNGKey(2),
            "segment": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
    params = gen.init(rngs, tokens, tlens, spec, slens)
    out = gen.apply(params, tokens, tlens, spec, slens,
                    rngs={"posterior": jax.random.PRNGKey(5),
                          "segment": jax.random.PRNGKey(6)})
    assert out["wav_seg"].shape == (b, cfg.segment_frames * 8)
    assert bool(jnp.all(out["durations"].sum(1) == slens))
    kl = vits_kl_loss(out["z_p"], out["m_p_exp"], out["logs_p_exp"],
                      out["logs_q"], out["feat_mask"])
    assert np.isfinite(float(kl))

    def loss_fn(p):
        o = gen.apply(p, tokens, tlens, spec, slens,
                      rngs={"posterior": jax.random.PRNGKey(7),
                            "segment": jax.random.PRNGKey(8)})
        dur = jnp.sum((o["log_dur_pred"] - o["log_dur_tgt"]) ** 2)
        return vits_kl_loss(o["z_p"], o["m_p_exp"], o["logs_p_exp"],
                            o["logs_q"], o["feat_mask"]) + dur + jnp.sum(
            o["wav_seg"] ** 2)

    g = jax.grad(loss_fn)(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_vits_inference():
    cfg = _tiny_cfg()
    gen = VITSGenerator(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (2, 5), 1, 12)
    tlens = jnp.array([5, 3])
    spec = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 33)) ** 2
    slens = jnp.array([20, 16])
    rngs = {"params": rng, "posterior": jax.random.PRNGKey(2),
            "segment": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
    params = gen.init(rngs, tokens, tlens, spec, slens)
    wav, wav_lens = gen.apply(
        params, tokens, tlens, 30, method=VITSGenerator.inference,
        rngs={"posterior": jax.random.PRNGKey(9)},
    )
    assert wav.shape[0] == 2 and wav.shape[1] == 30 * 8
    assert bool(jnp.all(jnp.isfinite(wav)))
    assert int(wav_lens[0]) > 0
