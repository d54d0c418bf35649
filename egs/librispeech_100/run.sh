#!/usr/bin/env bash
# LibriSpeech-100 recipe driver (reference egs2/librispeech_100/asr1/run.sh
# role). Requires $LIBRISPEECH to point at the extracted corpus root
# (the directory containing train-clean-100/ dev-clean/ ...).
#
#   LIBRISPEECH=/data/LibriSpeech bash egs/librispeech_100/run.sh
set -euo pipefail
cd "$(dirname "$0")/../.."

: "${LIBRISPEECH:?set LIBRISPEECH to the corpus root}"

if [ ! -f egs/librispeech_100/data/train_clean_100/wav.scp ]; then
  python -m espnet_tpu.bin.prep_librispeech \
    --librispeech "$LIBRISPEECH" \
    --output_dir egs/librispeech_100/data
fi

python -m espnet_tpu.bin.run \
  --config egs/librispeech_100/conf/train_asr_conformer.yaml "$@"
