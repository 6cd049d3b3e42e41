"""Train the chapter-boundary model.

TPU-native replacement for train_video_segment_ddp.py /
*_deepspeed.py / train_video_segment_point.py — one driver, the
distribution strategy is just the mesh.

    python -m video_chapter_generation_tpu.cli.train_segment \
        data.img_dir=... data.data_file=... data.train_vid_file=... \
        model.kind=two_stream_window model.head_type=mlp \
        --bert_vocab vocab.txt
"""

from __future__ import annotations

from ..data.datasets import ClipDataset, WindowClipDataset
from ..data.loader import DataLoader
from ..train.loop import Trainer
from ..train.tasks import SegmentTask, SegmentTextTask, SegmentWindowTask
from .common import load_bert_tokenizer, load_corpus, parse_config


def main(argv=None):
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    # --init_streams CKPT_DIR: warm-start the lang/vision streams from a
    # trained (base or window) segment checkpoint — the reference trains
    # its window model from PRETRAINED streams (bert-base + ImageNet
    # ResNet50, optionally finetuned: train_video_segment_ddp.py:448-464
    # lang_pretrain_ckpt_path / vision_pretrain_ckpt_path); with no
    # HF/torchvision weights in this environment, a trained base
    # two_stream checkpoint plays that role. The deep window head does
    # not bootstrap from fully random streams at reference LRs.
    init_streams = None
    if "--init_streams" in argv:
        i = argv.index("--init_streams")
        init_streams = argv[i + 1]
        del argv[i : i + 2]
    cfg, args = parse_config(argv, "train chapter-boundary model")
    corpus = load_corpus(cfg, "train")
    val_corpus = load_corpus(cfg, "val")
    tokenizer = load_bert_tokenizer(args, corpus)

    kind = cfg.model.kind
    hw = 64 if args.tiny else 224
    s2d = cfg.model.stem_input == "s2d"
    if kind == "two_stream_window":
        task = SegmentWindowTask(cfg, tiny=args.tiny, hw=hw)
        make_ds = lambda c: WindowClipDataset(
            c, tokenizer, cfg.data.clip_frame_num, cfg.data.max_text_len,
            cfg.data.window_size, cfg.model.data_mode, cfg.data.fps,
            cfg.train.seed, hw, s2d=s2d,
        )
    elif kind == "two_stream":
        task = SegmentTask(cfg, tiny=args.tiny, hw=hw)
        make_ds = lambda c: ClipDataset(
            c, tokenizer, cfg.data.clip_frame_num, cfg.data.max_text_len,
            cfg.model.data_mode, cfg.data.fps, cfg.train.seed, hw, s2d=s2d,
        )
    elif kind == "text":
        task = SegmentTextTask(cfg, tiny=args.tiny,
                               vocab_size=tokenizer.vocab_size)
        make_ds = lambda c: ClipDataset(
            c, tokenizer, cfg.data.clip_frame_num, cfg.data.max_text_len,
            "text", cfg.data.fps, cfg.train.seed, hw,
        )
    else:
        raise SystemExit(f"unknown model.kind {kind}")

    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(tokenizer))

    if init_streams:
        from ..core.checkpoint import CheckpointManager

        ck = CheckpointManager(init_streams)
        restored = ck.restore_raw()
        ck.close()
        assert restored is not None, f"no checkpoint in {init_streams}"
        step0, tree = restored
        base_init = task.init_variables

        def init_with_streams():
            v = base_init()
            for stream in ("lang_model", "vision_model"):
                assert stream in tree["params"], (stream,
                                                  list(tree["params"]))
                v["params"][stream] = tree["params"][stream]
                bs = tree.get("batch_stats") or {}
                if stream in bs:
                    v["batch_stats"][stream] = bs[stream]
            return v

        task.init_variables = init_with_streams
        print(f"warm-started lang/vision streams from {init_streams} "
              f"(step {step0})")

    import jax

    train_ds, val_ds = make_ds(corpus), make_ds(val_corpus)
    # multi-host: each process loads its shard (DistributedSampler analogue)
    train_loader = DataLoader(
        train_ds, cfg.data.batch_size, seed=cfg.train.seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    val_loader = DataLoader(val_ds, cfg.data.batch_size, shuffle=False,
                            drop_last=False)

    trainer = Trainer(cfg=cfg, task=task,
                      train_loader=train_loader, eval_loader=val_loader)
    metrics = trainer.train()
    print("final:", metrics, "best:", trainer.best_result)
    trainer.ckpt.close()


if __name__ == "__main__":
    main()
