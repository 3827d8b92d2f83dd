#!/bin/bash
# VERDICT r4 #8: quantify the imported-model streaming story.
#
# A full-context model served online needs decode-time chunked masks
# (the io/torch_import --attn_chunk approximation) OR a short
# --init_from fine-tune to exact-streaming weights. This measures the
# WER of each option on the synthetic corpus, turning ARCHITECTURE §6b's
# "fine-tune for exactness" into numbers:
#
#   (a) offline full-context decode      (the model's own WER)
#   (b) --attn_chunk 16 at decode time   (approximate streaming)
#   (c) --init_from fine-tune w/ chunked masks, 1 / 3 / 5 epochs,
#       decoded with the SAME chunked masks (exact streaming)
#
# Prereq: a trained full-context model (the precision_ab fast run).
# Usage: bash recipes/streaming_migration_ab.sh [EXP] [DATA] [OUT]
set -e
cd "$(dirname "$0")/.."
EXP=${1:-.cache/precision_ab/fast}
DATA=${2:-.cache/synth/corpus1h}
OUT=${3:-.cache/streaming_ab}
mkdir -p "$OUT"

recog() {  # recog <model_dir> <tag> [extra flags...]
  local model=$1 tag=$2; shift 2
  python -u -m speech_recognition_tools_tpu.cli.recog_e2e \
    "$model" "$EXP/egs_test" "$OUT/hyp_$tag.txt" \
    --beam_size 10 --ctc_weight 0.3 --max_len 200 \
    --jit_decode --batch_size 8 --bucket_frames 256 \
    --ref_text "$DATA/test/text" "$@" | tail -1 | sed "s/^/[$tag] /"
}

echo "=== (a) offline full-context"
recog "$EXP/am" offline

echo "=== (b) decode-time chunked masks (attn_chunk 16, left 4)"
recog "$EXP/am" chunk_approx --attn_chunk 16 --attn_left_chunks 4

echo "=== (c) exact-streaming fine-tune (init_from)"
prev="$EXP/am"
for ep in 1 3 5; do
  ft="$OUT/ft_ep$ep"
  rm -rf "$ft"
  python -u -m speech_recognition_tools_tpu.cli.train_e2e \
    "$EXP/egs_train" "$DATA/train/text" "$ft" \
    --dev_egs_dir "$EXP/egs_dev" \
    --init_from "$EXP/am" \
    --attn_chunk 16 --attn_left_chunks 4 \
    --epochs $ep --batch_size 32 --bucket_frames 128 \
    --compute_dtype bfloat16 --average_last 1 \
    --warmup_steps 2000 --transformer_lr 2.0 | tail -2
  recog "$ft" ft_ep$ep
done
echo "=== streaming migration A/B done (hyps + WER lines above)"
