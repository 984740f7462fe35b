#!/bin/bash
# Sequential QUALITY.md training queue for the single TPU chip.
# Trains each synthetic-benchmark config from scratch, then evals the best
# checkpoint (bf16). Logs to /tmp/q_<name>.{train,eval}.log; a summary line
# per model is appended to /tmp/quality_queue.summary.
#
# Usage: bash tools/quality_queue.sh [name ...]
#   (default: db pan pse dbpp table cml — db first: it is the CML teacher)
cd "$(dirname "$0")/.." || exit 1
SUMMARY=/tmp/quality_queue.summary
touch "$SUMMARY"

# Benchmark isolation: register this queue's pid so bench.py /
# __graft_entry__.entry() reap the whole subtree before touching the chip
# (utils/bgjobs.py).  OCR_TPU_REGISTER_BG makes every train/eval child
# self-register too — defense in depth if the queue shell dies first and
# orphans a training.
python -c "from pytorchocr_tpu.utils import bgjobs; bgjobs.register($$)"
export OCR_TPU_REGISTER_BG=1

declare -A CFG=(
  [db]=configs/det/det_r18_db_synth.yml
  [rec]=configs/rec/rec_vgg_bilstm_ctc_synth.yml
  [cls]=configs/cls/cls_mbv3small_synth.yml
  [pan]=configs/det/det_r18_pan_synth.yml
  [pse]=configs/det/det_r50_pse_synth.yml
  [dbpp]=configs/det/det_r18_dbpp_synth.yml
  [table]=configs/table/table_sla_synth.yml
  [cml]=configs/det/distillation/det_cml_db_synth.yml
  [mbv3]=configs/det/det_mbv3large05_db_synth.yml
  [starnet]=configs/rec/rec_vgg_tps_bilstm_ctc_synth.yml
)
declare -A OUT=(
  [db]=./output/quality/det_r18_db_synth
  [rec]=./output/quality/rec_vgg_bilstm_ctc_synth
  [cls]=./output/quality/cls_mbv3small_synth
  [pan]=./output/quality/det_r18_pan_synth
  [pse]=./output/quality/det_r50_pse_synth
  [dbpp]=./output/quality/det_r18_dbpp_synth
  [table]=./output/quality/table_sla_synth
  [cml]=./output/quality/det_cml_db_synth
  [mbv3]=./output/quality/det_mbv3large05_db_synth
  [starnet]=./output/quality/rec_starnet_synth
)

run_one() {
  local name=$1 cfg=${CFG[$1]} out=${OUT[$1]}
  echo "=== $(date +%H:%M:%S) TRAIN $name ($cfg) ===" | tee -a "$SUMMARY"
  timeout 14400 python tools/train.py -c "$cfg" \
    > "/tmp/q_${name}.train.log" 2>&1
  local rc=$?
  echo "train $name rc=$rc" >> "$SUMMARY"
  if [ ! -d "$out/best_accuracy" ]; then
    echo "$name: no best_accuracy checkpoint, skipping eval" >> "$SUMMARY"
    return 1
  fi
  echo "=== $(date +%H:%M:%S) EVAL $name ===" >> "$SUMMARY"
  timeout 3600 python tools/eval.py -c "$cfg" \
    -o Global.checkpoints="$out/best_accuracy" \
    > "/tmp/q_${name}.eval.log" 2>&1
  echo "eval $name rc=$?" >> "$SUMMARY"
  grep -h -A6 "metric eval" "/tmp/q_${name}.eval.log" | tail -7 >> "$SUMMARY"
}

NAMES=("$@")
[ ${#NAMES[@]} -eq 0 ] && NAMES=(db pan pse dbpp table cml)
for n in "${NAMES[@]}"; do
  run_one "$n"
done
echo "=== $(date +%H:%M:%S) QUEUE DONE ===" >> "$SUMMARY"
