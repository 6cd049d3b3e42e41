"""Evaluate a boundary model on precomputed flattened clips.

Replaces test_video_segment_point.py / test_video_segment_update.py:
scores every clip (static batched, jitted), computes per-video AUC/mAP +
cut-point P/R/F@0/3/5s + random baseline, writes the reference-format
result txt and vid2cut_points.json.

    python -m video_chapter_generation_tpu.cli.eval_segment \
        data.test_clips_json=test_clips.json \
        model.kind=text --bert_vocab vocab.txt \
        eval.checkpoint=checkpoints eval.result_file=res.txt
"""

from __future__ import annotations

import numpy as np

from ..data.datasets import InferClipDataset, InferWindowClipDataset
from ..evalkit.segment_eval import (
    evaluate_segment_predictions,
    write_segment_result_files,
)
from ..pipeline.boundary import score_clips
from .common import load_bert_tokenizer, parse_config


def main(argv=None):
    import argparse
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    # reproduce the reference's first-clip double-count (bit-parity with
    # its published result files; see evalkit/segment_eval.py docstring)
    compat = "--compat_first_clip" in argv
    if compat:
        argv.remove("--compat_first_clip")
    # --int8_vision: W8A8 int8 serving of the vision trunk, calibrated on
    # the first batch of eval clips — task-metric A/Bs vs bf16 run
    # through this REAL eval CLI (tools/impl_ab_eval.py)
    int8_vision = "--int8_vision" in argv
    if int8_vision:
        argv.remove("--int8_vision")

    cfg, args = parse_config(argv, "evaluate boundary model")
    tokenizer = _tokenizer_from_clips(cfg, args)

    # frame resolution must match the training contract (train_segment:
    # 64px for --tiny, 224 otherwise) — a resolution mismatch silently
    # destroys the vision stream's features at eval
    hw = 64 if args.tiny else 224
    if cfg.model.kind in ("two_stream_window",):
        ds = InferWindowClipDataset.from_json(
            cfg.data.test_clips_json, tokenizer,
            clip_frame_num=cfg.data.clip_frame_num,
            max_text_len=cfg.data.max_text_len,
            window_size=cfg.data.window_size, mode=cfg.model.data_mode,
            hw=hw,
        )
    else:
        ds = InferClipDataset.from_json(
            cfg.data.test_clips_json, tokenizer,
            max_text_len=cfg.data.max_text_len, mode=cfg.model.data_mode,
            hw=hw,
        )

    calib = None
    if int8_vision:
        assert cfg.model.kind in ("two_stream", "two_stream_window"), (
            "--int8_vision needs a two-stream model.kind")
        assert cfg.model.stem_input == "frames", (
            "--int8_vision on this CLI supports model.stem_input='frames'")
        n = min(cfg.data.batch_size, len(ds))
        if cfg.model.kind == "two_stream_window":
            # window clips [n, W, T, ...] -> per-clip [n*W, T, ...] for
            # trunk calibration
            calib = np.stack([ds[i]["img_clips"] for i in range(n)])
            calib = calib.reshape(-1, *calib.shape[2:])
        else:
            calib = np.stack([ds[i]["img_clip"] for i in range(n)])
    score_fn = build_score_fn(cfg, args, tokenizer, calib_clips=calib)
    score_clips(ds, score_fn, cfg.data.batch_size)

    result = evaluate_segment_predictions(
        ds.all_clip_infos, cfg.data.clip_frame_num, cfg.data.max_offset,
        rng=np.random.default_rng(cfg.train.seed),
        compat_first_clip_double_count=compat,
    )
    out_prefix = f"test_results/{cfg.model.kind}_head_{cfg.model.head_type}"
    write_segment_result_files(
        result, f"{out_prefix}.txt", f"{out_prefix}_vid2cut_points.json"
    )
    for k in ("mAP", "recall_3", "precision_3", "f1_3"):
        print(k, result[k])


def _tokenizer_from_clips(cfg, args):
    """Vocab file if given; otherwise build a vocab from the clip texts."""
    from ..data.tokenization import WordPieceTokenizer

    if args.bert_vocab:
        return WordPieceTokenizer.from_vocab_file(args.bert_vocab)
    import json

    with open(cfg.data.test_clips_json) as f:
        texts = [d["text_clip"] for d in json.load(f)]
    return WordPieceTokenizer.build_from_corpus(texts, vocab_size=8000)


def build_score_fn(cfg, args, tokenizer, mesh=None, calib_clips=None):
    """Construct the jitted scorer from a checkpointed train state.

    With `mesh`, the scorer shards its batch over the mesh 'data' axis
    (pipeline/sharded.py) — multi-chip clip scoring.

    `calib_clips` (uint8 [B, T, H, W, 3] real frames; two_stream kind
    only) enables int8 serving of the vision trunk: W8A8 activation
    scales are calibrated on them (ops.quantize.calibrate_two_stream_quant)
    and the scorer runs the quantized twin — PERF.md round 3, opt-in."""
    import jax

    from ..core.checkpoint import CheckpointManager
    from ..pipeline.boundary import (
        make_text_score_fn,
        make_two_stream_score_fn,
        make_window_score_fn,
    )
    from ..pipeline.sharded import (
        make_sharded_text_score_fn,
        make_sharded_two_stream_score_fn,
        make_sharded_window_score_fn,
    )
    from ..train.loop import create_train_state
    from ..train.optim import make_optimizer
    from ..train.tasks import SegmentTask, SegmentTextTask, SegmentWindowTask

    kind = cfg.model.kind
    hw = 64 if args.tiny else 224  # match train_segment's frame contract
    if kind == "text":
        task = SegmentTextTask(cfg, tiny=args.tiny,
                               vocab_size=tokenizer.vocab_size)
    elif kind == "two_stream":
        task = SegmentTask(cfg, tiny=args.tiny, hw=hw)
    else:
        task = SegmentWindowTask(cfg, tiny=args.tiny, hw=hw)

    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(tokenizer))

    variables = task.init_variables()
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    tx = make_optimizer(cfg.optim, variables["params"])
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        create_train_state(variables, tx),
    )
    restored = ckpt.restore_best(abstract) or ckpt.restore_latest(abstract)
    if restored is not None:
        step, state = restored
        # hard-fail on train/eval config divergence (the round-4
        # silent-zero-vision class of bug): the checkpoint carries its
        # training contract, this eval config must match it
        from ..core.contract import assert_contract

        assert_contract(ckpt.metrics_for(step).get("contract"),
                        task.contract, context="eval_segment")
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        print(f"restored checkpoint at step {int(state.step)}")
    ckpt.close()

    quant = None
    if calib_clips is not None:
        assert kind in ("two_stream", "two_stream_window"), (
            "int8 vision serving needs a two-stream scorer "
            f"(got model.kind={kind})")
        from ..ops.quantize import calibrate_two_stream_quant

        quant = calibrate_two_stream_quant(task.model, variables,
                                           calib_clips)

    if mesh is not None:
        if kind == "text":
            return make_sharded_text_score_fn(task.model, variables, mesh)
        if kind == "two_stream":
            return make_sharded_two_stream_score_fn(task.model, variables,
                                                    mesh,
                                                    quant_scales=quant)
        return make_sharded_window_score_fn(task.model, variables, mesh)
    if kind == "text":
        return make_text_score_fn(task.model, variables)
    if kind == "two_stream_window":
        return make_window_score_fn(task.model, variables,
                                    quant_scales=quant)
    if kind == "two_stream":
        return make_two_stream_score_fn(task.model, variables,
                                        quant_scales=quant)
    return make_window_score_fn(task.model, variables)


if __name__ == "__main__":
    main()
