"""Target speaker extraction training CLI.

Equivalent of `python -m espnet2.bin.enh_tse_train` (reference
`espnet2/tasks/enh_tse.py`). Usage:

    python -m espnet_tpu.bin.tse_train --data.train_dir data/train_tse \
        --run.output_dir exp/tse --run.best_metric valid.loss.min
"""

from espnet_tpu.tasks.tse import TSETask


def main(argv=None):
    TSETask.main(argv)


if __name__ == "__main__":
    main()
