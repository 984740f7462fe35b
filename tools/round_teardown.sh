#!/bin/bash
# Round teardown (round-3 lesson: a training that is still running at
# snapshot time dies unreported; round-4 lesson: the tunneled client
# intermittently wedges a fresh eval process — bounded timeout + one
# retry recovers it).  For every output/quality run dir that has a
# checkpoint, (re)generate any RESULT*.json that is missing or OLDER
# than the checkpoint: bf16 always, shifted for det families, int8 where
# the QUALITY.md row publishes it.  Then show what changed so the caller
# updates QUALITY.md and commits.
#
# Usage: bash tools/round_teardown.sh [name ...]   (default: all mapped)
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
declare -A IS_DET=(
  [det_r18_db_synth]=1 [det_r18_pan_synth]=1 [det_r50_pse_synth]=1
  [det_r18_dbpp_synth]=1 [det_mbv3large05_db_synth]=1 [det_cml_db_synth]=1
  [det_distill_db_synth]=1 [det_dml_db_synth]=1
)
declare -A WANT_INT8=(
  [det_r18_db_synth]=1 [rec_vgg_bilstm_ctc_synth]=1 [det_r18_pan_synth]=1
  [det_r50_pse_synth]=1 [det_r18_dbpp_synth]=1 [det_mbv3large05_db_synth]=1
)
SHIFTED_EVAL=./train_data/synthdet_shifted/eval_label.txt

# eval_retry <cfg> <ckpt> <json> <log> [extra -o args...]
eval_retry() {
  local cfg=$1 ck=$2 json=$3 log=$4; shift 4
  for attempt in 1 2; do
    timeout 900 python tools/eval.py -c "$cfg" \
      -o Global.checkpoints="$ck" Global.metric_json="$json" "$@" \
      > "$log" 2>&1
    local rc=$?
    echo "  eval rc=$rc (attempt $attempt) -> $json"
    [ $rc -eq 0 ] && return 0
    # wedged tunneled client: give the server a beat, then retry fresh
    sleep 20
  done
  return 1
}

NAMES=("$@")
[ ${#NAMES[@]} -eq 0 ] && NAMES=("${!CFG_OF[@]}")
for name in "${NAMES[@]}"; do
  out=output/quality/$name
  cfg=${CFG_OF[$name]}
  [ -n "$cfg" ] && [ -d "$out" ] || continue
  ck="$out/best_accuracy"
  [ -d "$ck" ] || ck="$out/latest"
  [ -d "$ck" ] || continue
  echo "=== teardown: $name ($ck) ==="
  if [ ! -f "$out/RESULT.json" ] || [ "$ck" -nt "$out/RESULT.json" ]; then
    eval_retry "$cfg" "$ck" "$out/RESULT.json" "$out/eval.log"
  fi
  if [ -n "${IS_DET[$name]}" ] && [ -f "$SHIFTED_EVAL" ] && {
       [ ! -f "$out/RESULT_shifted.json" ] ||
       [ "$ck" -nt "$out/RESULT_shifted.json" ]; }; then
    eval_retry "$cfg" "$ck" "$out/RESULT_shifted.json" "$out/eval_shifted.log" \
      Eval.dataset.label_file_list="[$SHIFTED_EVAL]"
  fi
  if [ -n "${WANT_INT8[$name]}" ] && {
       [ ! -f "$out/RESULT_int8.json" ] ||
       [ "$ck" -nt "$out/RESULT_int8.json" ]; }; then
    eval_retry "$cfg" "$ck" "$out/RESULT_int8.json" "$out/eval_int8.log" \
      Global.quant=true Global.quant_calib_n=8
  fi
done
echo "=== teardown done; review + commit output/quality changes ==="
git status --short output/quality | head -40
