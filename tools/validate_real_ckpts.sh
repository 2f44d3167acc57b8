#!/usr/bin/env bash
# One-command validation against the reference's PUBLISHED checkpoints
# (paper Tables 1 & 4) — standing NEXT.md #1, environment-blocked until the
# .pth files and datasets are reachable. Run from the repo root.
#
# Inputs (env vars or flags):
#   CKPT_DIR     directory containing the published files
#                  encoder_epoch_20.pth / decoder_epoch_20.pth
#                  best_deeplabv3plus_embedding_resnet101_cityscapes_os16.pth
#                  (optional) plm_ckpt.pth, prototype_car_5_shot.json
#   STREET_ROOT  StreetHazards dataset root (images/ annotations/ + odgt)
#   CITY_ROOT    Cityscapes root (leftImg8bit/ gtFine/)
#
# Outputs: printed reference-format metric blocks to diff against
#   - Table 1 (anomaly/eval_ood_traditional.py:641): AUROC/AUPR/FPR95 for
#     msp, maxlogit, dissum (+ crf variants, optional)
#   - Table 4 (test_embedding.py:648 / test_self_distillation.py:413):
#     Cityscapes 16+1 mIoU for NPM / PLM variants
#   - int8 / int8-hybrid drift on the REAL weights (NEXT.md #1 tail)
set -euo pipefail

CKPT_DIR=${CKPT_DIR:-ckpt_real}
STREET_ROOT=${STREET_ROOT:-data/streethazards}
CITY_ROOT=${CITY_ROOT:-data/cityscapes}
OUT=${OUT:-/tmp/owss_real_validation}
mkdir -p "$OUT"

echo "== 1. Convert the published checkpoints =="
python -m open_world_semantic_segmentation_tpu.cli.convert_checkpoint \
    anomaly --encoder "$CKPT_DIR/encoder_epoch_20.pth" \
    --decoder "$CKPT_DIR/decoder_epoch_20.pth" \
    --out "$OUT/streethazards_dml.pkl"
python -m open_world_semantic_segmentation_tpu.cli.convert_checkpoint \
    deeplab --ckpt \
    "$CKPT_DIR/best_deeplabv3plus_embedding_resnet101_cityscapes_os16.pth" \
    --out "$OUT/cityscapes16.pkl"

echo "== 2. Table 1: StreetHazards OOD (fp32 parity precision) =="
for method in msp maxlogit dissum; do
  echo "--- OOD.ood $method ---"
  python -m open_world_semantic_segmentation_tpu.cli.eval_ood \
      --cfg configs/test_ood_street.yaml --precision fp32 \
      OOD.ood "$method" \
      DATASET.root_dataset "$STREET_ROOT" \
      MODEL.weights_encoder "$OUT/streethazards_dml.pkl" \
      | tee "$OUT/table1_$method.txt"
done

echo "== 3. Table 4: Cityscapes 16+1 NPM (needs prototype json) =="
if [ -f "$CKPT_DIR/prototype_car_5_shot.json" ]; then
  python -m open_world_semantic_segmentation_tpu.cli.eval_embedding \
      --cfg configs/cityscapes_embedding.yaml --precision fp32 \
      DATASET.root_dataset "$CITY_ROOT" \
      MODEL.weights_encoder "$OUT/cityscapes16.pkl" \
      FEWSHOT.prototype_file "$CKPT_DIR/prototype_car_5_shot.json" \
      | tee "$OUT/table4_npm.txt"
else
  echo "skip: $CKPT_DIR/prototype_car_5_shot.json not present"
fi

echo "== 4. Table 4: PLM/FT self-distillation (optional ckpt) =="
if [ -f "$CKPT_DIR/plm_ckpt.pth" ]; then
  python -m open_world_semantic_segmentation_tpu.cli.convert_checkpoint \
      deeplab --ckpt "$CKPT_DIR/plm_ckpt.pth" \
      --heads classifier classifier_1 --out "$OUT/plm.pkl"
  python -m open_world_semantic_segmentation_tpu.cli.self_distillation \
      --mode eval --cfg configs/self_distillation.yaml --precision fp32 \
      DATASET.root_dataset "$CITY_ROOT" \
      MODEL.weights_encoder "$OUT/plm.pkl" FEWSHOT.variant plm_all \
      | tee "$OUT/table4_plm.txt"
else
  echo "skip: $CKPT_DIR/plm_ckpt.pth not present"
fi

echo "== 5. int8 / int8-hybrid metric drift on REAL weights =="
for q in int8 int8-hybrid; do
  echo "--- quant $q ---"
  python -m open_world_semantic_segmentation_tpu.cli.eval_ood \
      --cfg configs/test_ood_street.yaml --quant "$q" \
      OOD.ood dissum \
      DATASET.root_dataset "$STREET_ROOT" \
      MODEL.weights_encoder "$OUT/streethazards_dml.pkl" \
      | tee "$OUT/drift_$q.txt"
done

echo "All outputs under $OUT — diff the printed blocks against paper"
echo "Tables 1 and 4 (values are printed in the reference's own format)."
