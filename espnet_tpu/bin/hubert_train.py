"""HuBERT pretraining CLI (equivalent of
`python -m espnet2.bin.hubert_train`, reference
`espnet2/bin/hubert_train.py`)."""

from espnet_tpu.tasks.hubert import HubertTask


def main(argv=None):
    HubertTask.main(argv)


if __name__ == "__main__":
    main()
