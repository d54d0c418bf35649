"""VITS training CLI (reference analogue: `espnet2/bin/gan_tts_train.py`
with the VITS model, `espnet2/gan_tts/vits/vits.py`)."""

from espnet_tpu.tasks.vits import VITSTask


def main(argv=None):
    VITSTask.main(argv)


if __name__ == "__main__":
    main()
