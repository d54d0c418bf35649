"""UASR alternating GAN step.

Behavioral spec: reference `espnet2/train/uasr_trainer.py` (alternating
generator/discriminator optimisation with `optim_idx` routing) and the
loss assembly of `espnet2/uasr/espnet_model.py` (discriminator real/fake
BCE + gradient penalty; generator adversarial + smoothness + diversity).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from espnet_tpu.models.uasr import (
    UASRModel, one_hot_text, uasr_generator_losses,
)
from espnet_tpu.train.gan_steps import GANTrainState


def _bce(logits, target):
    # mean BCE-with-logits against a constant target (0 or 1)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def make_uasr_train_step(
    model: UASRModel,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
) -> Callable:
    """Returns step(state, feats, flens, text, tlens, rng) -> (state, stats).

    state.gen_params / state.disc_params hold the generator /
    discriminator subtrees of the flax model."""
    cfg = model.config

    def step(state: GANTrainState, feats, flens, text, tlens, rng):
        from espnet_tpu.models.uasr import UASRDiscriminator, UASRGenerator

        gen_mod = UASRGenerator(cfg)
        disc_mod = UASRDiscriminator(cfg)

        def generate(gp):
            logits, out_lens, mask = gen_mod.apply(
                {"params": gp}, feats, flens
            )
            return jax.nn.softmax(logits, axis=-1), out_lens, mask

        real_probs, real_mask = one_hot_text(text, tlens, cfg.vocab_size)

        # ---- discriminator update ----
        fake_probs, _, fake_mask = jax.tree_util.tree_map(
            jax.lax.stop_gradient, generate(state.gen_params)
        )
        u = min(real_probs.shape[1], fake_probs.shape[1])

        def disc_loss_fn(dp):
            d_real = disc_mod.apply({"params": dp}, real_probs, real_mask)
            d_fake = disc_mod.apply({"params": dp}, fake_probs, fake_mask)
            loss_real = _bce(d_real, 1.0)
            loss_fake = _bce(d_fake, 0.0)
            # gradient penalty on interpolated (cropped) sequences
            eps = jax.random.uniform(
                jax.random.fold_in(rng, state.step),
                (real_probs.shape[0], 1, 1),
            )
            interp = (eps * real_probs[:, :u]
                      + (1.0 - eps) * fake_probs[:, :u])
            gp_mask = real_mask[:, :u] | fake_mask[:, :u]

            def d_on(x):
                return jnp.sum(disc_mod.apply({"params": dp}, x, gp_mask))

            g = jax.grad(d_on)(interp)
            gnorm = jnp.sqrt(jnp.sum(g ** 2, axis=(1, 2)) + 1e-12)
            gp = jnp.mean((gnorm - 1.0) ** 2)
            loss = loss_real + loss_fake + cfg.gp_weight * gp
            return loss, (loss_real, loss_fake, gp)

        (d_loss, (d_r, d_f, gp)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params)
        d_up, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                        state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_up)

        # ---- generator update ----
        def gen_loss_fn(gp_):
            probs, _, mask = generate(gp_)
            d_fake = disc_mod.apply({"params": disc_params}, probs, mask)
            adv, smooth, diversity = uasr_generator_losses(
                probs, mask, d_fake, cfg
            )
            loss = (adv + cfg.smooth_weight * smooth
                    + cfg.diversity_weight * diversity)
            return loss, (adv, smooth, diversity)

        (g_loss, (adv, smooth, diversity)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params)
        g_up, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                      state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_up)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
        )
        stats = {
            "loss": g_loss, "adv": adv, "smooth": smooth,
            "diversity": diversity, "discriminator_loss": d_loss,
            "disc_real_loss": d_r, "disc_fake_loss": d_f,
            "gradient_penalty": gp,
        }
        return new_state, stats

    return step
