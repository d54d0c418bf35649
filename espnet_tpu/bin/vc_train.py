"""VC training CLI (equivalent of `python -m espnet.bin.vc_train`,
reference `espnet/bin/vc_train.py`)."""

from espnet_tpu.tasks.vc import VCTask


def main(argv=None):
    VCTask.main(argv)


if __name__ == "__main__":
    main()
