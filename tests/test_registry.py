"""Plugin registry (`espnet2/train/class_choices.py:1` role): third-party
encoders/decoders/separators resolve by name without source edits."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.utils import registry


@pytest.fixture(autouse=True)
def _clean():
    saved = {k: dict(v) for k, v in registry._REGISTRIES.items()}
    yield
    registry._REGISTRIES.clear()
    registry._REGISTRIES.update(
        {k: dict(v) for k, v in saved.items()}
    )


def test_register_get_available_and_conflict():
    @registry.register("encoder", "toy")
    class Toy:
        pass

    assert registry.get("encoder", "toy") is Toy
    assert "toy" in registry.available("encoder")
    # re-registering the same class is idempotent
    registry.register("encoder", "toy")(Toy)
    with pytest.raises(ValueError, match="already"):
        registry.register("encoder", "toy")(int)


def test_plugin_encoder_in_asr_model():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    @registry.register("encoder", "mean_pool")
    class MeanPoolEncoder(nn.Module):
        d_model: int = 16
        pool: int = 4

        @nn.compact
        def __call__(self, feats, lengths, deterministic=True):
            b, t, f = feats.shape
            tt = t // self.pool * self.pool
            x = feats[:, :tt].reshape(b, tt // self.pool, self.pool, f)
            x = x.mean(axis=2)
            x = nn.Dense(self.d_model)(x)
            return x, jnp.maximum(lengths // self.pool, 1)

    cfg = ASRConfig(
        vocab_size=11, input_type="feats", n_mels=8, use_specaug=False,
        normalize="none", encoder_type="mean_pool",
        encoder_conf={"d_model": 16, "pool": 4},
        d_model=16, num_heads=2, d_ff=32, num_decoder_layers=1,
        decoder_d_ff=32, ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 20, 8), jnp.float32)
    lens = jnp.array([20, 16])
    text = jnp.array([[1, 2, 3], [4, 5, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    vars_ = model.init(jax.random.PRNGKey(0), feats, lens, text, tlens, True)
    loss, stats = model.apply(vars_, feats, lens, text, tlens, True)
    assert np.isfinite(float(loss))


def test_unknown_name_lists_plugins():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    @registry.register("encoder", "somewhere")
    class X:
        pass

    cfg = ASRConfig(vocab_size=11, encoder_type="nope")
    with pytest.raises(ValueError, match="somewhere"):
        ASRModel(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 800)), jnp.array([800]),
            jnp.zeros((1, 2), jnp.int32), jnp.array([2]), True,
        )


def test_plugin_separator_in_enh_model():
    from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig

    @registry.register("separator", "passthrough")
    class Passthrough(nn.Module):
        input_dim: int
        num_spk: int = 2
        gain: float = 1.0

        @nn.compact
        def __call__(self, feat, lengths, deterministic=True):
            scale = self.param("s", nn.initializers.ones, ())
            out = jnp.stack(
                [feat * scale * self.gain] * self.num_spk, axis=1)
            return out, lengths, {}

    cfg = EnhConfig(num_spk=2, encoder_type="conv", enc_channels=8,
                    enc_kernel=16, enc_stride=8,
                    separator_type="passthrough",
                    separator_conf={"gain": 0.5}, loss_type="si_snr")
    model = EnhancementModel(cfg)
    n = 320
    mix = jax.random.normal(jax.random.PRNGKey(1), (1, n))
    refs = jax.random.normal(jax.random.PRNGKey(2), (1, 2, n))
    lens = jnp.array([n])
    vars_ = model.init(jax.random.PRNGKey(0), mix, lens, refs)
    loss, stats = model.apply(vars_, mix, lens, refs)
    assert np.isfinite(float(loss))
