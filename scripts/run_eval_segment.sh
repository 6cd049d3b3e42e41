#!/bin/sh
# Canonical segment evaluation (test_video_segment_point.py analogue).
set -e
DATA=${DATA:-dataset}

python -m video_chapter_generation_tpu.datasetkit.flatten \
    --img_dir "$DATA/youtube_video_frame_dataset" \
    --data_file "$DATA/all_in_one_with_subtitle_final.csv" \
    --vid_file "$DATA/final_test.txt" \
    --out "$DATA/test_clips_clip_frame_num_16.json" --clip_frame_num 16

python -m video_chapter_generation_tpu.cli.eval_segment \
    data.test_clips_json="$DATA/test_clips_clip_frame_num_16.json" \
    model.kind=two_stream_window model.head_type=mlp \
    data.clip_frame_num=16 --bert_vocab "$DATA/bert_vocab.txt" "$@"
