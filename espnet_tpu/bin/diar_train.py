"""Diarization training CLI (equivalent of
`python -m espnet2.bin.diar_train`, reference `espnet2/bin/diar_train.py`)."""

from espnet_tpu.tasks.diar import DiarTask


def main(argv=None):
    DiarTask.main(argv)


if __name__ == "__main__":
    main()
