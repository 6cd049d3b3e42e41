#!/bin/sh
# Canonical chapter-localization training run (the reference's
# scripts/run_chapter_localization.sh analogue). Adjust paths.
set -e
DATA=${DATA:-dataset}

python -m video_chapter_generation_tpu.cli.train_segment \
    data.img_dir="$DATA/youtube_video_frame_dataset" \
    data.data_file="$DATA/all_in_one_with_subtitle_final.csv" \
    data.train_vid_file="$DATA/final_train.txt" \
    data.val_vid_file="$DATA/final_validation.txt" \
    model.kind=two_stream_window model.head_type=mlp \
    data.clip_frame_num=16 data.window_size=1 data.batch_size=16 \
    optim.learning_rate=1e-5 optim.lr_decay_type=cosine \
    optim.warmup_epochs=2 optim.final_epochs=300 \
    optim.gradient_accumulation_steps=2 \
    train.max_epochs=300 train.eval_every_epochs=30 \
    --bert_vocab "$DATA/bert_vocab.txt" "$@"
