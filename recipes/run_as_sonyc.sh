#!/bin/bash
# SONYC-UST fine-tuning recipe: start from the released large-v1 TL-TR head
# and extend the classifier to the 533-class AudioSet+SONYC label space
# (mirrors run_as_soync.sh).
set -euo pipefail

model=whisper-high-lw_tr_1_8
model_size=large-v1
lr=1e-4
n_class=533

data_root=${DATA_ROOT:-./data/sonyc}
feat_root=${FEAT_ROOT:-./data/feat_sonyc/whisper_${model_size}}
pretrained=${PRETRAINED:-./exp/as_full-${model_size}/models/audio_model_wa.npz}
exp_dir=./exp/sonyc-${model_size}-${model}-lr${lr}

python -m whisper_at_tpu.train.run \
  --model ${model} --model_size ${model_size} --dataset sonyc \
  --n_class ${n_class} \
  --data-train ${data_root}/sonyc_train.json \
  --data-val ${data_root}/sonyc_validate.json \
  --label-csv ${data_root}/class_labels_indices_sonyc.csv \
  --tar_path_train ${feat_root} --tar_path_val ${feat_root} \
  --exp-dir ${exp_dir} \
  --pretrained_model ${pretrained} \
  --lr ${lr} --n-epochs 50 -b 48 -w 8 \
  --lrscheduler_start 20 --lrscheduler_step 5 --lrscheduler_decay 0.75 \
  --freqm 0 --timem 10 --mixup 0.5 --label_smooth 0.1 \
  --metrics mAP --loss BCE \
  --wa True --wa_start 21 --wa_end 50 \
  --save_model True
