"""Multi-speaker ASR training CLI (reference analogue: the mix recipes
around `espnet/nets/pytorch_backend/e2e_asr_mix.py`)."""

from espnet_tpu.tasks.asr_mix import ASRMixTask


def main(argv=None):
    ASRMixTask.main(argv)


if __name__ == "__main__":
    main()
