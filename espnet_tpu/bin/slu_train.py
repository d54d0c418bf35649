"""SLU training CLI (reference analogue: the slu1 recipes driving
`espnet2/bin/asr_train.py` with intent-annotated transcripts)."""

from espnet_tpu.tasks.slu import SLUTask


def main(argv=None):
    SLUTask.main(argv)


if __name__ == "__main__":
    main()
