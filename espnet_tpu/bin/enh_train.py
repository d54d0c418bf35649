"""Enhancement training CLI.

Equivalent of `python -m espnet2.bin.enh_train` (reference
`espnet2/bin/enh_train.py`). Usage:

    python -m espnet_tpu.bin.enh_train --data.train_dir data/train_mix \
        --run.output_dir exp/enh --model.separator_type tcn \
        --run.best_metric valid.loss.min
"""

from espnet_tpu.tasks.enh import EnhTask


def main(argv=None):
    EnhTask.main(argv)


if __name__ == "__main__":
    main()
