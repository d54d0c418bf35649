"""GAN (generator/discriminator) training step for vocoder training.

Behavioral spec: reference `espnet2/train/gan_trainer.py:52` (GANTrainer:
alternating generator/discriminator updates routed by `optim_idx`; each
substep is forward -> backward -> clip -> step) specialised to the HiFiGAN
criterion set (`espnet2/gan_tts/hifigan/loss.py`): discriminator
least-squares real/fake loss; generator = adversarial + lambda_fm * feature
matching + lambda_mel * mel-spectrogram L1.

TPU formulation: both substeps fuse into ONE jitted function per shape
bucket — D update then G update (fresh discriminator outputs on the same
fake audio), all under `value_and_grad` with static loss weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from espnet_tpu.models.tts.hifigan import (
    discriminator_adversarial_loss, feature_match_loss,
    generator_adversarial_loss, mel_spectrogram_loss,
)


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_opt: Any
    rng: Any = None

    @classmethod
    def create(cls, gen_params, gen_tx, disc_params, disc_tx, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_opt=gen_tx.init(gen_params),
            disc_params=disc_params,
            disc_opt=disc_tx.init(disc_params),
            rng=rng,
        )


@dataclasses.dataclass(frozen=True)
class GANLossWeights:
    adv: float = 1.0
    feat_match: float = 2.0
    mel: float = 45.0
    # multi-resolution STFT loss (Parallel WaveGAN / multi-band MelGAN
    # criterion, `parallel_wavegan` MultiResolutionSTFTLoss); 0 = off
    stft: float = 0.0
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80


def make_gan_train_step(
    generator,
    discriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    weights: GANLossWeights = GANLossWeights(),
) -> Callable:
    """Returns step(state, mel (B,T,M), wav (B,N)) -> (state, stats)."""

    w = weights

    def step(state: GANTrainState, mel, wav):
        real = wav[:, :, None]
        rng = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        next_rng, noise_key = jax.random.split(rng)

        def gen_wav(gp):
            # noise-driven generators (PWG/StyleMelGAN) read the "noise"
            # rng; deterministic ones (HiFiGAN/MelGAN) ignore it
            fake = generator.apply({"params": gp}, mel,
                                   rngs={"noise": noise_key})  # (B, N', 1)
            n = real.shape[1]
            t = fake.shape[1]
            if t >= n:
                return fake[:, :n]
            return jnp.pad(fake, ((0, 0), (0, n - t), (0, 0)))

        # ---- discriminator update ----
        fake_sg = jax.lax.stop_gradient(gen_wav(state.gen_params))

        def disc_loss_fn(dp):
            real_outs = discriminator.apply({"params": dp}, real)
            fake_outs = discriminator.apply({"params": dp}, fake_sg)
            lr, lf = discriminator_adversarial_loss(real_outs, fake_outs)
            return lr + lf, (lr, lf)

        (d_loss, (d_real, d_fake)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update (against the UPDATED discriminator) ----
        def gen_loss_fn(gp):
            fake = gen_wav(gp)
            fake_outs = discriminator.apply({"params": disc_params}, fake)
            real_outs = discriminator.apply({"params": disc_params}, real)
            adv = generator_adversarial_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel_l1 = mel_spectrogram_loss(
                wav, fake[..., 0], w.fs, w.n_fft, w.hop_length, w.n_mels
            )
            loss = w.adv * adv + w.feat_match * fm + w.mel * mel_l1
            if w.stft > 0.0:
                from espnet_tpu.models.tts.vocoders import (
                    multi_resolution_stft_loss,
                )

                loss = loss + w.stft * multi_resolution_stft_loss(
                    fake[..., 0], wav
                )
            return loss, (adv, fm, mel_l1)

        (g_loss, (adv, fm, mel_l1)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params)
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1, rng=next_rng,
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
        )
        stats = {
            "loss": g_loss, "generator_adv_loss": adv,
            "feat_match_loss": fm, "mel_loss": mel_l1,
            "discriminator_loss": d_loss, "disc_real_loss": d_real,
            "disc_fake_loss": d_fake,
        }
        return new_state, stats

    return step


def make_vits_train_step(
    generator,
    discriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    hop_length: int,
    upsample: int,
    lambda_adv: float = 1.0,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
    lambda_kl: float = 1.0,
    lambda_dur: float = 1.0,
    mel_fs: int = 16000,
    mel_n_fft: int = 1024,
    mel_bins: int = 80,
) -> Callable:
    """VITS joint step (`espnet2/gan_tts/vits/vits.py:278` forward routing
    generator/discriminator substeps; losses per `vits/loss.py` +
    hifigan loss set). step(state, tokens, tlens, spec, slens, wav, rng)."""
    from espnet_tpu.models.tts.vits import (
        VITSGenerator, slice_wav_segments, vits_kl_loss,
    )

    seg_frames = generator.config.segment_frames
    seg_samples = seg_frames * upsample

    def step(state: GANTrainState, tokens, tlens, spec, slens, wav, rng):
        r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        rngs = {"posterior": r1, "segment": r2, "dropout": r3}

        def gen_out(gp):
            return generator.apply(
                {"params": gp}, tokens, tlens, spec, slens, False, rngs=rngs
            )

        # ---- discriminator update ----
        out_sg = jax.lax.stop_gradient(gen_out(state.gen_params))
        real_seg = slice_wav_segments(
            wav, out_sg["seg_starts"], seg_samples, hop_length
        )

        def disc_loss_fn(dp):
            real_outs = discriminator.apply(
                {"params": dp}, real_seg[:, :, None])
            fake_outs = discriminator.apply(
                {"params": dp}, out_sg["wav_seg"][:, :, None])
            lr, lf = discriminator_adversarial_loss(real_outs, fake_outs)
            return lr + lf, (lr, lf)

        (d_loss, _), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update ----
        def gen_loss_fn(gp):
            o = gen_out(gp)
            real = slice_wav_segments(
                wav, o["seg_starts"], seg_samples, hop_length
            )
            fake_outs = discriminator.apply(
                {"params": disc_params}, o["wav_seg"][:, :, None])
            real_outs = discriminator.apply(
                {"params": disc_params}, real[:, :, None])
            adv = generator_adversarial_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel = mel_spectrogram_loss(
                real, o["wav_seg"], mel_fs, mel_n_fft, hop_length, mel_bins
            )
            kl = vits_kl_loss(o["z_p"], o["m_p_exp"], o["logs_p_exp"],
                              o["logs_q"], o["feat_mask"])
            tmask = o["text_mask"]
            dur = jnp.sum(
                (o["log_dur_pred"] - o["log_dur_tgt"]) ** 2 * tmask
            ) / jnp.maximum(jnp.sum(tmask), 1.0)
            loss = (lambda_adv * adv + lambda_fm * fm + lambda_mel * mel
                    + lambda_kl * kl + lambda_dur * dur)
            return loss, (adv, fm, mel, kl, dur)

        (g_loss, (adv, fm, mel, kl, dur)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
        )
        stats = {"loss": g_loss, "generator_adv_loss": adv,
                 "feat_match_loss": fm, "mel_loss": mel, "kl_loss": kl,
                 "dur_loss": dur, "discriminator_loss": d_loss}
        return new_state, stats

    return step


def make_jets_train_step(
    generator,
    discriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    hop_length: int,
    lambda_adv: float = 1.0,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
    lambda_var: float = 1.0,
    lambda_align: float = 2.0,
    mel_fs: int = 16000,
    mel_n_fft: int = 1024,
    mel_bins: int = 80,
) -> Callable:
    """JETS joint step (`espnet2/gan_tts/jets/jets.py:42` forward routing;
    losses per `jets/loss.py`: hifigan set + variance MSEs + forward-sum).
    step(state, tokens, tlens, feats, flens, pitch, energy, wav, rng)."""
    from espnet_tpu.models.tts.jets import forward_sum_loss
    from espnet_tpu.models.tts.vits import slice_wav_segments

    seg_frames = generator.config.segment_frames
    upsample = generator.upsample_factor
    seg_samples = seg_frames * upsample

    def step(state: GANTrainState, tokens, tlens, feats, flens,
             pitch, energy, wav, rng):
        r1, r2 = jax.random.split(jax.random.fold_in(rng, state.step))
        rngs = {"segment": r1, "dropout": r2}

        def gen_out(gp):
            return generator.apply(
                {"params": gp}, tokens, tlens, feats, flens, pitch, energy,
                False, rngs=rngs,
            )

        # ---- discriminator update ----
        out_sg = jax.lax.stop_gradient(gen_out(state.gen_params))
        real_seg = slice_wav_segments(
            wav, out_sg["seg_starts"], seg_samples, hop_length
        )

        def disc_loss_fn(dp):
            real_outs = discriminator.apply(
                {"params": dp}, real_seg[:, :, None])
            fake_outs = discriminator.apply(
                {"params": dp}, out_sg["wav_seg"][:, :, None])
            lr, lf = discriminator_adversarial_loss(real_outs, fake_outs)
            return lr + lf, (lr, lf)

        (d_loss, _), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update ----
        def gen_loss_fn(gp):
            o = gen_out(gp)
            real = slice_wav_segments(
                wav, o["seg_starts"], seg_samples, hop_length
            )
            fake_outs = discriminator.apply(
                {"params": disc_params}, o["wav_seg"][:, :, None])
            real_outs = discriminator.apply(
                {"params": disc_params}, real[:, :, None])
            adv = generator_adversarial_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel = mel_spectrogram_loss(
                real, o["wav_seg"], mel_fs, mel_n_fft, hop_length, mel_bins
            )
            tm = o["text_mask"]
            n_tok = jnp.maximum(jnp.sum(tm), 1.0)
            log_d_tgt = jnp.log(o["durations"] + 1.0)
            dur = jnp.sum((o["d_pred"] - log_d_tgt) ** 2 * tm) / n_tok
            pit = jnp.sum((o["p_pred"] - o["p_tgt"]) ** 2 * tm) / n_tok
            ene = jnp.sum((o["e_pred"] - o["e_tgt"]) ** 2 * tm) / n_tok
            align = forward_sum_loss(o["log_p_attn"], tlens, flens)
            loss = (lambda_adv * adv + lambda_fm * fm + lambda_mel * mel
                    + lambda_var * (dur + pit + ene) + lambda_align * align)
            return loss, (adv, fm, mel, dur, pit, ene, align)

        (g_loss, (adv, fm, mel, dur, pit, ene, align)), g_grads = (
            jax.value_and_grad(gen_loss_fn, has_aux=True)(state.gen_params)
        )
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
        )
        stats = {
            "loss": g_loss, "generator_adv_loss": adv,
            "feat_match_loss": fm, "mel_loss": mel,
            "duration_loss": dur, "pitch_loss": pit, "energy_loss": ene,
            "forward_sum_loss": align, "discriminator_loss": d_loss,
        }
        return new_state, stats

    return step


def make_visinger_train_step(
    generator,
    discriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    hop_length: int,
    upsample: int,
    lambda_adv: float = 1.0,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
    lambda_kl: float = 1.0,
    lambda_dur: float = 1.0,
    mel_fs: int = 16000,
    mel_n_fft: int = 1024,
    mel_bins: int = 80,
) -> Callable:
    """VISinger joint step (`espnet2/gan_svs/vits/` under the GAN trainer):
    the VITS criterion set, with the score (midi + durations) conditioning
    the generator. step(state, tokens, midi, durations, tlens, spec,
    slens, wav, rng)."""
    from espnet_tpu.models.tts.vits import slice_wav_segments, vits_kl_loss

    seg_frames = generator.config.vits.segment_frames
    seg_samples = seg_frames * upsample

    def step(state: GANTrainState, tokens, midi, durations, tlens,
             spec, slens, wav, rng):
        r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        rngs = {"posterior": r1, "segment": r2, "dropout": r3}

        def gen_out(gp):
            return generator.apply(
                {"params": gp}, tokens, midi, durations, tlens, spec,
                slens, False, rngs=rngs,
            )

        out_sg = jax.lax.stop_gradient(gen_out(state.gen_params))
        real_seg = slice_wav_segments(
            wav, out_sg["seg_starts"], seg_samples, hop_length
        )

        def disc_loss_fn(dp):
            real_outs = discriminator.apply(
                {"params": dp}, real_seg[:, :, None])
            fake_outs = discriminator.apply(
                {"params": dp}, out_sg["wav_seg"][:, :, None])
            lr, lf = discriminator_adversarial_loss(real_outs, fake_outs)
            return lr + lf, (lr, lf)

        (d_loss, _), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        def gen_loss_fn(gp):
            o = gen_out(gp)
            real = slice_wav_segments(
                wav, o["seg_starts"], seg_samples, hop_length
            )
            fake_outs = discriminator.apply(
                {"params": disc_params}, o["wav_seg"][:, :, None])
            real_outs = discriminator.apply(
                {"params": disc_params}, real[:, :, None])
            adv = generator_adversarial_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel = mel_spectrogram_loss(
                real, o["wav_seg"], mel_fs, mel_n_fft, hop_length, mel_bins
            )
            kl = vits_kl_loss(o["z_p"], o["m_p_exp"], o["logs_p_exp"],
                              o["logs_q"], o["feat_mask"])
            tmask = o["text_mask"]
            dur = jnp.sum(
                (o["log_dur_pred"] - o["log_dur_tgt"]) ** 2 * tmask
            ) / jnp.maximum(jnp.sum(tmask), 1.0)
            loss = (lambda_adv * adv + lambda_fm * fm + lambda_mel * mel
                    + lambda_kl * kl + lambda_dur * dur)
            return loss, (adv, fm, mel, kl, dur)

        (g_loss, (adv, fm, mel, kl, dur)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
        )
        stats = {
            "loss": g_loss, "generator_adv_loss": adv,
            "feat_match_loss": fm, "mel_loss": mel, "kl_loss": kl,
            "duration_loss": dur, "discriminator_loss": d_loss,
        }
        return new_state, stats

    return step
