#!/bin/bash
# Round teardown (round-3 lesson: a training that is still running at
# snapshot time dies unreported).  For every output/quality run dir that
# has a checkpoint but whose RESULT.json is missing or OLDER than the
# checkpoint, eval the best (else latest) checkpoint and write the
# artifact of record; then show what changed so the caller can update
# QUALITY.md and commit.  Run ~30-45 min before round end.
#
# Usage: bash tools/round_teardown.sh
cd "$(dirname "$0")/.." || exit 1
python -c "from pytorchocr_tpu.utils import bgjobs; bgjobs.register($$)" 2>/dev/null
export OCR_TPU_REGISTER_BG=1

declare -A CFG_OF=(
  [det_r18_db_synth]=configs/det/det_r18_db_synth.yml
  [rec_vgg_bilstm_ctc_synth]=configs/rec/rec_vgg_bilstm_ctc_synth.yml
  [cls_mbv3small_synth]=configs/cls/cls_mbv3small_synth.yml
  [det_r18_pan_synth]=configs/det/det_r18_pan_synth.yml
  [det_r50_pse_synth]=configs/det/det_r50_pse_synth.yml
  [det_r18_dbpp_synth]=configs/det/det_r18_dbpp_synth.yml
  [table_sla_synth]=configs/table/table_sla_synth.yml
  [det_cml_db_synth]=configs/det/distillation/det_cml_db_synth.yml
  [det_mbv3large05_db_synth]=configs/det/det_mbv3large05_db_synth.yml
  [rec_starnet_synth]=configs/rec/rec_vgg_tps_bilstm_ctc_synth.yml
  [rec_bigvocab_synth]=configs/rec/rec_vgg_bilstm_ctc_bigvocab.yml
  [det_distill_db_synth]=configs/det/distillation/det_distill_db_synth.yml
  [det_dml_db_synth]=configs/det/distillation/det_dml_db_synth.yml
)

for out in output/quality/*/; do
  name=$(basename "$out")
  cfg=${CFG_OF[$name]}
  [ -n "$cfg" ] || { echo "teardown: no config mapped for $name, skipping"; continue; }
  ck="$out/best_accuracy"
  [ -d "$ck" ] || ck="$out/latest"
  [ -d "$ck" ] || continue
  if [ -f "$out/RESULT.json" ] && [ "$out/RESULT.json" -nt "$ck" ]; then
    continue  # artifact already covers this checkpoint
  fi
  echo "=== teardown eval: $name ($ck) ==="
  timeout 1200 python tools/eval.py -c "$cfg" \
    -o Global.checkpoints="$ck" Global.metric_json="$out/RESULT.json" \
    > "/tmp/teardown_${name}.eval.log" 2>&1
  echo "rc=$?"
  cp "/tmp/teardown_${name}.eval.log" "$out/eval.log"
  grep -h -A6 "metric eval" "/tmp/teardown_${name}.eval.log" | tail -7
done
echo "=== teardown done; review + commit output/quality changes ==="
git status --short output/quality | head -30
