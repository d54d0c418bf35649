"""TTS training CLI (equivalent of `python -m espnet2.bin.tts_train`).

    python -m espnet_tpu.bin.tts_train --config conf/tacotron2.yaml \
        --data.train_dir data/train --run.output_dir exp/tts \
        --model.tts_type tacotron2

FastSpeech2 additionally needs a `durations` file in the data dirs (frames
per token), producible with bin/tts_teacher_durations.py from a trained
Tacotron2.
"""

from espnet_tpu.tasks.tts import TTSTask


def main(argv=None):
    TTSTask.main(argv)


if __name__ == "__main__":
    main()
