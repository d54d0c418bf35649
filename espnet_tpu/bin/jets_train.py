"""JETS training CLI (reference analogue: `espnet2/bin/gan_tts_train.py`
with the JETS model, `espnet2/gan_tts/jets/jets.py`)."""

from espnet_tpu.tasks.jets import JETSTask


def main(argv=None):
    JETSTask.main(argv)


if __name__ == "__main__":
    main()
