#!/bin/bash
# AudioSet-full TL-TR head training recipe (TPU).
# Mirrors the reference hyperparameters (run_as_full_train.sh: lr 5e-5,
# bs 48, mixup 0.5, timem 10, label smoothing 0.1, balanced sampling,
# 30 epochs == 3 effective passes (10% iters/epoch), MultiStep 15/5/0.75,
# weight averaging over epochs 16-30).
set -euo pipefail

model=whisper-high-lw_tr_1_8   # TL-TR; use lw_down_tr_512_1_8 for TL-TR-512
model_size=large-v1
lr=5e-5                        # 1e-4 for the _low variant and small/base/tiny

data_root=${DATA_ROOT:-./data/audioset}
feat_root=${FEAT_ROOT:-./data/feat_as_full/whisper_${model_size}}
exp_dir=./exp/as_full-${model_size}-${model}-lr${lr}

python -m whisper_at_tpu.train.run \
  --model ${model} --model_size ${model_size} --dataset as-full \
  --data-train ${data_root}/as_full_train.json \
  --data-val ${data_root}/as_eval.json \
  --label-csv ${data_root}/class_labels_indices.csv \
  --tar_path_train ${feat_root} --tar_path_val ${feat_root} \
  --exp-dir ${exp_dir} \
  --lr ${lr} --n-epochs 30 -b 48 -w 8 \
  --lrscheduler_start 15 --lrscheduler_step 5 --lrscheduler_decay 0.75 \
  --freqm 0 --timem 10 --mixup 0.5 --bal bal --label_smooth 0.1 \
  --metrics mAP --loss BCE \
  --wa True --wa_start 16 --wa_end 30 \
  --save_model True
