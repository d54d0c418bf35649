"""LM training CLI (equivalent of `python -m espnet2.bin.lm_train`).

    python -m espnet_tpu.bin.lm_train --config conf/lm.yaml \
        --data.train_dir data/train --run.output_dir exp/lm \
        --data.token_list exp/asr/tokens.txt
"""

from espnet_tpu.tasks.lm import LMTask


def main(argv=None):
    LMTask.main(argv)


if __name__ == "__main__":
    main()
