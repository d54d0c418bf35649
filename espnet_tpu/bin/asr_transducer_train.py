"""Transducer ASR training CLI.

Equivalent of training with `espnet2/tasks/asr_transducer.py` (reference
`espnet2/bin/asr_transducer_train.py`). Usage:

    python -m espnet_tpu.bin.asr_transducer_train --config conf/train.yaml \
        --data.train_dir data/train --run.output_dir exp/rnnt
"""

from espnet_tpu.tasks.transducer import TransducerTask


def main(argv=None):
    TransducerTask.main(argv)


if __name__ == "__main__":
    main()
