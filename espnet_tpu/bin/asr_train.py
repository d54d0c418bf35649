"""ASR training CLI.

Equivalent of `python -m espnet2.bin.asr_train` (reference
`espnet2/bin/asr_train.py:22`). Usage:

    python -m espnet_tpu.bin.asr_train --config conf/train.yaml \
        --data.train_dir data/train --data.valid_dir data/dev \
        --run.output_dir exp/asr --model.d_model 256

`--print_config true` dumps the resolved config and exits.
"""

from espnet_tpu.tasks.asr import ASRTask


def main(argv=None):
    ASRTask.main(argv)


if __name__ == "__main__":
    main()
