"""ST training CLI (equivalent of `python -m espnet2.bin.st_train`,
reference `espnet2/bin/st_train.py`)."""

from espnet_tpu.tasks.st import STTask


def main(argv=None):
    STTask.main(argv)


if __name__ == "__main__":
    main()
