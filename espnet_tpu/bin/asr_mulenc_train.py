"""Multi-encoder ASR training CLI (reference analogue: the mulenc recipes
around `espnet/nets/pytorch_backend/e2e_asr_mulenc.py`)."""

from espnet_tpu.tasks.asr_mulenc import ASRMulEncTask


def main(argv=None):
    ASRMulEncTask.main(argv)


if __name__ == "__main__":
    main()
