"""Unsupervised ASR training CLI (reference analogue:
`espnet2/bin/uasr_train.py`, wav2vec-U style GAN)."""

from espnet_tpu.tasks.uasr import UASRTask


def main(argv=None):
    UASRTask.main(argv)


if __name__ == "__main__":
    main()
