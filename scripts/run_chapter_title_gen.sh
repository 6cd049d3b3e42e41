#!/bin/sh
# Canonical chapter-title training run (train_chapter_title_gen.py analogue).
set -e
DATA=${DATA:-dataset}

python -m video_chapter_generation_tpu.cli.train_title \
    data.data_file="$DATA/all_in_one_with_subtitle_final.csv" \
    data.train_vid_file="$DATA/final_train.txt" \
    data.val_vid_file="$DATA/final_validation.txt" \
    data.title_input_len=512 data.title_decode_len=30 data.batch_size=16 \
    optim.learning_rate=3e-4 train.max_epochs=500 \
    --spm_tsv "$DATA/pegasus_unigram.tsv" "$@"
