"""Unsupervised ASR (wav2vec-U style GAN).

Behavioral spec: reference `espnet2/uasr/espnet_model.py:38`
(ESPnetUASRModel: segmenter -> generator emitting phone distributions,
discriminator over phone sequences; generator loss = adversarial +
smoothness + phoneme-diversity (+aux), discriminator loss = real/fake +
gradient penalty; trained by the alternating `espnet2/train/uasr_trainer.py`)
with `espnet2/uasr/generator/conv_generator.py` and
`espnet2/uasr/discriminator/conv_discriminator.py`.

TPU formulation: both optimiser substeps fuse into one jitted step (same
shape every iteration); the gradient penalty is one extra `jax.grad`
through the discriminator on interpolated inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.masks import make_valid_mask


@dataclasses.dataclass(frozen=True)
class UASRConfig:
    vocab_size: int = -1          # phone inventory (incl. <sil>=0)
    feat_dim: int = 80
    channels: int = 256
    kernel: int = 4
    stride: int = 2               # generator downsampling
    disc_channels: int = 256
    disc_layers: int = 3
    disc_kernel: int = 6
    smooth_weight: float = 0.5
    diversity_weight: float = 1.0
    gp_weight: float = 1.5
    dtype: Any = jnp.float32


class UASRGenerator(nn.Module):
    """Feature segments -> phone distributions
    (`uasr/generator/conv_generator.py`)."""

    config: UASRConfig

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        c = self.config
        x = nn.Dense(c.channels, dtype=c.dtype, name="in_proj")(feats)
        x = nn.gelu(x)
        x = nn.Conv(c.channels, (c.kernel,), strides=(c.stride,),
                    padding="SAME", dtype=c.dtype, name="conv")(x)
        x = nn.gelu(x)
        logits = nn.Dense(c.vocab_size, dtype=c.dtype, name="out")(x)
        out_lens = jnp.maximum(
            (lengths + c.stride - 1) // c.stride, 1
        ).astype(jnp.int32)
        mask = make_valid_mask(out_lens, logits.shape[1])
        return logits, out_lens, mask


class UASRDiscriminator(nn.Module):
    """Phone-distribution sequences -> per-sequence score
    (`uasr/discriminator/conv_discriminator.py`)."""

    config: UASRConfig

    @nn.compact
    def __call__(self, probs, mask):
        # probs (B, U, V); mask (B, U)
        c = self.config
        x = probs * mask[..., None].astype(probs.dtype)
        for i in range(c.disc_layers):
            x = nn.Conv(c.disc_channels, (c.disc_kernel,), padding="SAME",
                        dtype=c.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (c.disc_kernel,), padding="SAME", dtype=c.dtype,
                    name="out")(x)[..., 0]  # (B, U)
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return jnp.sum(x * mask.astype(x.dtype), axis=1) / denom  # (B,)


def uasr_generator_losses(probs, mask, d_fake, cfg: UASRConfig):
    """Adversarial (non-saturating BCE on fake) + segment smoothness +
    phoneme diversity (`espnet_model.py` loss assembly)."""
    adv = jnp.mean(
        jnp.maximum(d_fake, 0) - d_fake + jnp.log1p(jnp.exp(-jnp.abs(d_fake)))
    )  # -log sigmoid(D(fake)) (generator wants D(fake) high)
    # smoothness: mean squared difference of adjacent frame distributions
    diff = (probs[:, 1:] - probs[:, :-1]) ** 2
    m2 = (mask[:, 1:] & mask[:, :-1])[..., None].astype(probs.dtype)
    smooth = jnp.sum(diff * m2) / jnp.maximum(jnp.sum(m2), 1.0)
    # diversity: maximise entropy of the batch-mean phone distribution
    mean_p = jnp.sum(
        probs * mask[..., None].astype(probs.dtype), axis=(0, 1)
    ) / jnp.maximum(jnp.sum(mask), 1.0)
    entropy = -jnp.sum(mean_p * jnp.log(mean_p + 1e-8))
    diversity = -entropy
    return adv, smooth, diversity


def one_hot_text(text, text_lengths, vocab_size):
    """Real phone sequences -> one-hot distributions + mask."""
    mask = make_valid_mask(text_lengths, text.shape[1])
    probs = jax.nn.one_hot(text, vocab_size)
    return probs * mask[..., None], mask


class UASRModel(nn.Module):
    """Bundles generator + discriminator so one checkpoint holds both
    (`espnet_model.py:38`)."""

    config: UASRConfig

    def setup(self):
        self.generator = UASRGenerator(self.config, name="generator")
        self.discriminator = UASRDiscriminator(self.config,
                                               name="discriminator")

    def generate(self, feats, lengths, deterministic: bool = True):
        logits, out_lens, mask = self.generator(feats, lengths,
                                                deterministic)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, out_lens, mask

    def discriminate(self, probs, mask):
        return self.discriminator(probs, mask)

    def __call__(self, feats, lengths, text, text_lengths,
                 deterministic: bool = True):
        """Convenience forward for initialisation/eval: returns the
        generator adversarial stats (no optimisation routing)."""
        c = self.config
        probs, out_lens, mask = self.generate(feats, lengths, deterministic)
        d_fake = self.discriminate(probs, mask)
        real_probs, real_mask = one_hot_text(text, text_lengths,
                                             c.vocab_size)
        d_real = self.discriminate(real_probs, real_mask)
        adv, smooth, diversity = uasr_generator_losses(
            probs, mask, d_fake, c
        )
        loss = (adv + c.smooth_weight * smooth
                + c.diversity_weight * diversity)
        stats = {
            "loss": loss, "adv": adv, "smooth": smooth,
            "diversity": diversity,
            "d_real": jnp.mean(d_real), "d_fake": jnp.mean(d_fake),
        }
        return loss, stats
