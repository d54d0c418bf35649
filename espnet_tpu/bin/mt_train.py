"""MT training CLI (equivalent of `python -m espnet2.bin.mt_train`,
reference `espnet2/bin/mt_train.py`)."""

from espnet_tpu.tasks.mt import MTTask


def main(argv=None):
    MTTask.main(argv)


if __name__ == "__main__":
    main()
