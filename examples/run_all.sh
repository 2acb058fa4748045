#!/usr/bin/env bash
# Drive every example in --small mode (tiny random weights, no network).
# Usage: bash examples/run_all.sh [outdir]
# Each script exits 0 and writes an image/artifact; any failure aborts.
set -euo pipefail
cd "$(dirname "$0")"
OUT="${1:-/tmp/k2_examples}"
mkdir -p "$OUT"

run() {
  name="$1"; shift
  echo "=== $name $*"
  t0=$(date +%s)
  python "$name" "$@"
  echo "    ok ($(( $(date +%s) - t0 ))s)"
}

run text2img_20.py   --small --out "$OUT/t2i_20.png"
run img2img_20.py    --small --out "$OUT/i2i_20.png"
run inpainting_20.py --small --out "$OUT/inp_20.png"
run text2img_21.py   --small --out "$OUT/t2i_21.png"
run img2img_21.py    --small --out "$OUT/i2i_21.png"
run inpainting_21.py --small --out "$OUT/inp_21.png"
run mix_images_21.py --small --out "$OUT/mix_21.png"
run hires_21.py      --small --out "$OUT/hires_21.png"
run text2img_22.py   --small --out "$OUT/t2i_22.png"
run controlnet_22.py --small --out "$OUT/ctl_22.png"
run lora_22.py       --small --out "$OUT/lora_22.png"
run serving_lora.py  --small
run train_decoder.py --small
run train_prior.py   --small
run train_lora_22.py --small --steps 5 --out "$OUT/lora_train_22.png"
run distill_22.py    --small --steps 5 --out "$OUT/distill_22.png"
run train_sp.py      --steps 2
echo "ALL EXAMPLES OK -> $OUT"
