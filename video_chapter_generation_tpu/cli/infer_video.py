"""Whole-pipeline per-video inference: boundaries -> cut points -> titles.

Replaces test_whole_pipeline_per_video.py with batched, KV-cached stages.
`--vision_emb_dir DIR` switches the title stage to the vision-conditioned
model (Seq2SeqVisionEmb fed by the extract_vision_emb dump; the reference's
best-ROUGE configuration, test_chapter_title_gen_vision_emb.py +
pegasus_vision_emb.py:189-206).

    python -m video_chapter_generation_tpu.cli.infer_video \
        data.data_file=... data.test_vid_file=... --bert_vocab v.txt \
        --vids vid1,vid2 [--vision_emb_dir vision_embs] [--num_beams 4] \
        [--pipelined]
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

import functools

from ..models.seq2seq import (
    beam_search,
    generate,
    trim_at_eos,
)
from ..pipeline import ChapterPipeline
from .common import (
    load_bert_tokenizer,
    load_corpus,
    load_title_tokenizer,
    parse_config,
    title_s2s_config,
)
from .eval_segment import build_score_fn


def main(argv=None):
    import sys

    vids, vision_emb_dir, fusion_type = None, None, "cross_attn"
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--vids" in argv:
        i = argv.index("--vids")
        vids = argv[i + 1].split(",")
        del argv[i : i + 2]
    if "--vision_emb_dir" in argv:
        i = argv.index("--vision_emb_dir")
        vision_emb_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--fusion_type" in argv:
        i = argv.index("--fusion_type")
        fusion_type = argv[i + 1]
        del argv[i : i + 2]
    num_beams = 1
    if "--num_beams" in argv:
        i = argv.index("--num_beams")
        num_beams = int(argv[i + 1])
        del argv[i : i + 2]
    pipelined = "--pipelined" in argv
    if pipelined:
        argv.remove("--pipelined")
    # --sharded: shard clip scoring + title decode over ALL local devices'
    # 'data' mesh axis (pipeline/sharded.py). Combine with multi-process
    # launches (parallel.dist.initialize) for video-level fan-out.
    sharded = "--sharded" in argv
    if sharded:
        argv.remove("--sharded")
    # --int8_titles: int8 serving of the title model — weight-only int8
    # kernels (ops.quantize.quantize_seq2seq; int8->bf16 convert fused
    # into the decode matmuls) + int8 cross-attention KV cache
    # (cfg.kv_quant). Measured together 1.32x on the Pegasus-large
    # decode step — PERF.md round 3.
    int8_titles = "--int8_titles" in argv
    if int8_titles:
        argv.remove("--int8_titles")
    # --int8_vision: int8 serving of the boundary scorer — W8A8 vision
    # trunk (ops.quantize.calibrate_two_stream_quant + the int8 Pallas
    # bottleneck kernels; +11.5% vision device time, PERF.md round 3).
    # Activation scales calibrate on the first video's real frames.
    int8_vision = "--int8_vision" in argv
    if int8_vision:
        argv.remove("--int8_vision")

    cfg, args = parse_config(argv, "whole-pipeline per-video inference")
    corpus = load_corpus(cfg, "test")
    tokenizer = load_bert_tokenizer(args, corpus)
    title_tokenizer = load_title_tokenizer(args, corpus)

    mesh = None
    if sharded:
        from ..parallel import make_mesh

        mesh = make_mesh()  # all local devices on the data axis
        assert cfg.data.batch_size % mesh.shape["data"] == 0, (
            cfg.data.batch_size, dict(mesh.shape))
    calib = None
    if int8_vision:
        assert cfg.model.kind == "two_stream", (
            "--int8_vision needs model.kind=two_stream")
        # the non-packed scoring path (make_two_stream_score_fn) feeds
        # plain [B,T,224,224,3] frames; s2d-stem models need the packed
        # per-video flow (ChapterPipeline(frame_pack=True) /
        # bench_pipeline.py) — fail early with a clear message instead
        # of an opaque stem shape error mid-calibration
        assert cfg.model.stem_input == "frames", (
            "--int8_vision on this CLI supports model.stem_input="
            "'frames' only; use the packed pipeline for s2d stems")
        from ..data.frames import load_clip_frames

        vid0 = (vids or corpus.vids)[0]
        seg = cfg.data.clip_frame_num
        n_img = corpus.image_num(vid0)
        starts = list(range(0, max(1, n_img - seg), seg))
        starts = starts[: cfg.data.batch_size]
        # calibration clips must match the model's stem contract
        # (calibrate_two_stream_quant: s2d pack for stem_input='s2d',
        # plain [T,224,224,3] frames otherwise)
        calib = np.stack([
            load_clip_frames(
                [corpus.frame_path(vid0, min(s + k + 1, n_img))
                 for k in range(seg)], 224,
                s2d=(cfg.model.stem_input == "s2d"))
            for s in starts])
    score_fn = build_score_fn(cfg, args, tokenizer, mesh=mesh,
                              calib_clips=calib)

    s2s_cfg = title_s2s_config(args, title_tokenizer)
    from ..models.seq2seq import Seq2Seq
    from ..train.tasks import TitleGenTask, TitleGenVisionTask
    from .eval_title import _restore

    emb_dim = 2048
    if vision_emb_dir is not None:
        task = TitleGenVisionTask(cfg, s2s_cfg, fusion_type=fusion_type,
                                  vision_emb_size=emb_dim)
    else:
        task = TitleGenTask(cfg, s2s_cfg)
    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(title_tokenizer))
    # restores the best/latest title checkpoint from cfg.train.ckpt_dir
    # when one exists; random weights otherwise (smoke mode)
    variables = _restore(cfg, task)

    if int8_titles:
        import dataclasses

        import jax

        from ..ops.quantize import quantize_seq2seq

        variables = jax.jit(quantize_seq2seq)(variables)
        s2s_cfg = dataclasses.replace(s2s_cfg, weight_quant=True,
                                      kv_quant=True)
        task.model = task.model.clone(cfg=s2s_cfg)

    decode = (functools.partial(beam_search, num_beams=num_beams)
              if num_beams > 1 else generate)

    if vision_emb_dir is not None:
        inner = Seq2Seq(s2s_cfg)

        def title_fn(text_ids, attention_mask, vision_embs, vision_mask):
            ids = jnp.asarray(text_ids)
            mask = jnp.asarray(attention_mask)
            # fused encode, then the same KV-cached decode on the inner
            # Seq2Seq via enc_hidden_override
            enc = task.model.apply(
                variables, jnp.asarray(vision_embs),
                jnp.asarray(vision_mask), ids, mask,
                method=task.model.encode_fused,
            )
            gen_ids, _ = decode(
                inner, {"params": variables["params"]["seq2seq"]}, ids, mask,
                max_len=cfg.data.title_decode_len, enc_hidden_override=enc,
            )
            return trim_at_eos(gen_ids, s2s_cfg.eos_token_id)
    else:
        def title_fn(text_ids, attention_mask):
            gen_ids, _ = decode(
                task.model, variables, jnp.asarray(text_ids),
                jnp.asarray(attention_mask),
                max_len=cfg.data.title_decode_len,
            )
            return trim_at_eos(gen_ids, s2s_cfg.eos_token_id)

    if mesh is not None:
        from ..pipeline import shard_title_fn

        title_fn = shard_title_fn(title_fn, mesh)

    from ..data.datasets import npy_vision_emb_provider

    pipe = ChapterPipeline(
        corpus, tokenizer, score_fn, title_fn,
        decode_fn=title_tokenizer.decode,
        clip_frame_num=cfg.data.clip_frame_num,
        max_text_len=cfg.data.max_text_len,
        title_input_len=cfg.data.title_input_len,
        batch_size=cfg.data.batch_size,
        score_mode=cfg.model.data_mode,
        title_tokenizer=title_tokenizer,
        vision_emb_provider=(npy_vision_emb_provider(vision_emb_dir)
                             if vision_emb_dir is not None else None),
        vision_emb_dim=emb_dim,
    )
    from ..parallel import dist

    if dist.process_count() > 1:
        from ..pipeline import run_videos_distributed

        results = run_videos_distributed(pipe, vids, pipelined=pipelined)
    else:
        results = pipe.run(vids, pipelined=pipelined)
    import os

    os.makedirs("test_results", exist_ok=True)
    out_path = "test_results/whole_pipeline_result.txt"
    with open(out_path, "w") as f:
        for vid, r in results.items():
            line = json.dumps({
                "vid": vid, "cut_points": r.cut_points, "titles": r.titles,
            })
            print(line)
            f.write(f"vid: {vid}\n")
            f.write(f"pred cut points: {r.cut_points}\n")
            gt = corpus.raw_cut_secs(vid)
            f.write(f"gt cut points: {gt}\n")
            for (start, end), title in zip(r.spans, r.titles):
                f.write(f"  [{start} - {end}] {title}\n")
            f.write("\n")
    print(f"wrote {out_path}")
    print(f"throughput: {pipe.videos_per_minute():.2f} videos/min")


if __name__ == "__main__":
    main()
