#!/usr/bin/env bash
# AN4 same-data head-to-head: our staged recipe vs the reference's own
# torch model code. Produces docs/RESULTS_an4.md's numbers.
# Usage: bash tools/an4_headtohead.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-egs_work/an4}
mkdir -p "$WORK"

# 1) data prep from the reference's bundled corpus (SPHERE read natively)
if [ ! -f "$WORK/data/train/wav.scp" ]; then
  python -m espnet_tpu.bin.prep_an4 \
    --tar /root/reference/egs/mini_an4/asr1/downloads.tar.gz \
    --workdir "$WORK" --output_dir "$WORK/data"
fi

# 2) OUR full recipe (stages 1-11) on the reference split semantics
ASR_ARGS="--run.max_epoch 300 --run.log_interval 50 --data.batch_size 4 \
--model.n_mels 80 --model.use_specaug false --model.normalize global_mvn \
--model.encoder_type transformer --model.d_model 64 --model.num_heads 4 \
--model.d_ff 256 --model.num_encoder_layers 4 --model.num_decoder_layers 2 \
--model.decoder_d_ff 256 --model.dropout_rate 0.1 --model.ctc_weight 0.3 \
--optim.schedule constant --optim.lr 1e-3"
JAX_PLATFORMS=cpu python -m espnet_tpu.bin.run \
  --recipe.expdir "$WORK/exp" --recipe.datadir "$WORK/data" \
  --recipe.train_set train_nodev --recipe.valid_set train_dev \
  --recipe.test_sets "train_nodev train_dev test" \
  --recipe.local_data "" --recipe.token_type char \
  --recipe.asr_args "$ASR_ARGS" \
  --recipe.decode_args "--beam_size 5 --ctc_weight 0.3 --max_steps 40 --batch_size 4" \
  --recipe.stop_stage 11

# decode the FINAL checkpoint too (the 2-utt valid set makes the default
# valid-acc n-best averaging noise; see docs/RESULTS_an4.md)
for s in train_nodev train_dev test; do
  JAX_PLATFORMS=cpu python -m espnet_tpu.bin.asr_inference \
    --exp_dir "$WORK/exp/asr" --data_dir "$WORK/data/$s" \
    --output_dir "$WORK/exp/decode_${s}_final" \
    --params "$WORK/exp/asr/ep300.params.msgpack" \
    --beam_size 5 --ctc_weight 0.3 --max_steps 40 --batch_size 4
done

# 3) the REFERENCE's model code on identical data (torch CPU)
python tools/ref_an4_train.py --data "$WORK/data" --out "$WORK/ref_exp" \
  --epochs 300

echo "== ours (final ckpt) =="
for s in train_nodev train_dev test; do
  echo "[$s]"; head -1 "$WORK/exp/decode_${s}_final/score_wer.txt"
done
echo "== reference =="
cat "$WORK/ref_exp/summary.json"
