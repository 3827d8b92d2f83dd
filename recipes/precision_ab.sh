#!/bin/bash
# VERDICT r4 #2: measure the front-end precision WER delta (fast vs
# high) on a synthetic corpus, end-to-end through run_corpus, so every
# recipes/configs/*.json can pin `frontend.precision` from a measurement
# instead of inheriting the default silently.
#
# Usage: bash recipes/precision_ab.sh [DATA_DIR] [OUT_ROOT]
# Writes <OUT_ROOT>/{fast,high}/RESULTS and a summary line.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-.cache/synth/corpus1h}
OUT=${2:-.cache/precision_ab}

if [ ! -d "$DATA" ]; then
  python recipes/make_synth_corpus.py --out "$DATA" \
    --train_hours 1 --dev_minutes 10 --test_minutes 10
fi

for prec in fast high; do
  echo "=== precision=$prec"
  # high (f64) compiles are expensive through the remote-compile
  # tunnel; pad everything to ONE 15 s bucket so the f64 program
  # compiles once (padding compute is trivial at >1000x realtime)
  bsec=4; [ "$prec" = high ] && bsec=15
  timeout 10800 python -u recipes/run_corpus.py \
    --config recipes/configs/wsj_fdlp_e2e.json \
    --data "$DATA" --expdir "$OUT/$prec" \
    --profile_stages \
    --set frontend.precision=$prec \
    --set frontend.bucket_seconds=$bsec \
    --set am.elayers=6 --set am.dlayers=3 \
    --set am.eunits=1024 --set am.dunits=1024 \
    --set am.epochs=15 --set am.compute_dtype=bfloat16 \
    --set am.bucket_frames=128 --set am.warmup_steps=2000 \
    --set am.average_last=5 \
    --set decode.bucket_frames=256 \
    --set lm=null
done

echo "=== precision A/B summary"
for prec in fast high; do
  echo "precision=$prec: $(cat $OUT/$prec/RESULTS)"
done
