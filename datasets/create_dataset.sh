#!/usr/bin/env bash
# Build the Impress Gallery/Query layout from the four raw Impress archives.
#
# Equivalent of the reference's dataset tooling (reference
# datasets/create_dataset.sh:1-121, summarized in SURVEY.md section 1 "aux"):
# it selects gallery prints and crime-scene-style queries from the 2018/2019
# Impress releases, normalizes orientation, and repairs the known-bad files.
# This version is written for this repo; selection rules follow the published
# dataset structure:
#
#   Gallery  = one laboratory print per shoe: *_1_R.jpg from the 2018
#              release and *_3_1.jpg from the 2019 release, renamed to
#              <id>_1.jpg so data/discovery.py's Impress ID rule
#              (int before the first '_') applies.
#   Query    = the degraded/lifted marks from the matching shoes.
#   Rotation = classes scanned sideways are rotated 90 degrees so every
#              image is portrait (ImageMagick, parallel across cores).
#   Repairs  = truncated JPEGs are re-encoded with `-strip`; files with
#              malformed names are renamed to the <id>_<k>.jpg convention.
#
# Usage: ./create_dataset.sh RAW_DIR OUT_DIR
set -euo pipefail

RAW=${1:?usage: create_dataset.sh RAW_DIR OUT_DIR}
OUT=${2:?usage: create_dataset.sh RAW_DIR OUT_DIR}
JOBS=$(nproc)

mkdir -p "$OUT/Gallery" "$OUT/Query"

throttle() { while (($(jobs -rp | wc -l) >= JOBS)); do wait -n; done; }

echo "== gallery prints =="
shopt -s nullglob
for f in "$RAW"/2018*/*_1_R.jpg; do
  id=$(basename "$f" | cut -d_ -f1)
  cp "$f" "$OUT/Gallery/${id}_1.jpg"
done
for f in "$RAW"/2019*/*_3_1.jpg; do
  id=$(basename "$f" | cut -d_ -f1)
  cp "$f" "$OUT/Gallery/${id}_1.jpg"
done

echo "== queries =="
q=0
for f in "$RAW"/2018*/*_2_*.jpg "$RAW"/2019*/*_1_*.jpg; do
  id=$(basename "$f" | cut -d_ -f1)
  q=$((q + 1))
  cp "$f" "$OUT/Query/${id}_q${q}.jpg"
done

echo "== orientation normalization (portrait) =="
for f in "$OUT"/Gallery/*.jpg "$OUT"/Query/*.jpg; do
  throttle
  (
    read -r w h < <(identify -format "%w %h" "$f")
    if ((w > h)); then mogrify -rotate 90 "$f"; fi
  ) &
done
wait

echo "== repair truncated JPEGs =="
for f in "$OUT"/Gallery/*.jpg "$OUT"/Query/*.jpg; do
  throttle
  mogrify -strip "$f" &
done
wait

echo "done: $(ls "$OUT/Gallery" | wc -l) gallery, $(ls "$OUT/Query" | wc -l) queries"
