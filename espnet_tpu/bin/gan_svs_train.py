"""GAN-SVS (VISinger) training CLI (reference analogue:
`espnet2/bin/gan_svs_train.py`)."""

from espnet_tpu.tasks.gan_svs import GanSVSTask


def main(argv=None):
    GanSVSTask.main(argv)


if __name__ == "__main__":
    main()
