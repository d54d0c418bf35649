"""HiFiGAN vocoder training CLI (reference analogue: GAN-TTS vocoder
training via `espnet2/train/gan_trainer.py` over
`espnet2/gan_tts/hifigan/`)."""

from espnet_tpu.tasks.vocoder import VocoderTask


def main(argv=None):
    VocoderTask.main(argv)


if __name__ == "__main__":
    main()
