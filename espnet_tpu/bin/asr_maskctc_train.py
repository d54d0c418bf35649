"""Mask-CTC ASR training CLI.

Equivalent of training `espnet2/asr/maskctc_model.py:39` via
`espnet2.bin.asr_train --model maskctc`. Usage:

    python -m espnet_tpu.bin.asr_maskctc_train \
        --data.train_dir data/train --data.valid_dir data/dev \
        --run.output_dir exp/maskctc
"""

from espnet_tpu.tasks.maskctc import MaskCTCTask


def main(argv=None):
    MaskCTCTask.main(argv)


if __name__ == "__main__":
    main()
