"""SVS training CLI (reference analogue: `espnet2/bin/svs_train.py`)."""

from espnet_tpu.tasks.svs import SVSTask


def main(argv=None):
    SVSTask.main(argv)


if __name__ == "__main__":
    main()
