"""Train the chapter-title generator (Pegasus recipe).

Replaces train_chapter_title_gen.py (+ _vision_emb / _accelerator
variants): one driver; vision conditioning via --vision_emb_dir.

    python -m video_chapter_generation_tpu.cli.train_title \
        data.data_file=... data.train_vid_file=... --spm_tsv pieces.tsv
"""

from __future__ import annotations

from ..data.datasets import (
    ChapterTitleDataset,
    ChapterTitleVisionEmbDataset,
    npy_vision_emb_provider,
)
from ..data.loader import DataLoader
from ..train.loop import Trainer
from ..train.tasks import TitleGenTask, TitleGenVisionTask
from .common import (
    load_corpus,
    load_title_tokenizer,
    parse_config,
    title_s2s_config,
)


def main(argv=None):
    import argparse
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    # --remat: rematerialized encoder/decoder layers. Measured SLOWER at
    # the tuned defaults (B=16 bf16 is not memory-bound; PERF.md round
    # 4) — only useful to push batch beyond 16 on one chip.
    remat = "--remat" in argv
    if remat:
        argv.remove("--remat")

    cfg, args = parse_config(argv, "train chapter-title generator")
    corpus = load_corpus(cfg, "train")
    val_corpus = load_corpus(cfg, "val")
    tokenizer = load_title_tokenizer(args, corpus)

    # --title_arch pegasus|bigbird|bart (bigbird = block-sparse
    # long-context encoder; pair with data.title_input_len=3072)
    s2s = title_s2s_config(args, tokenizer)
    if remat:
        import dataclasses

        s2s = dataclasses.replace(s2s, remat=True)

    vision_dir = cfg.model.vision_init  # reused: path to vision emb dump
    if vision_dir:
        provider = npy_vision_emb_provider(vision_dir)
        task = TitleGenVisionTask(cfg, s2s)
        make_ds = lambda c: ChapterTitleVisionEmbDataset(
            c, tokenizer, provider, max_vision_emb=cfg.data.max_vision_emb,
            max_text_len=cfg.data.title_input_len,
            chapter_title_text_len=cfg.data.title_decode_len,
            seed=cfg.train.seed,
        )
    else:
        task = TitleGenTask(cfg, s2s)
        make_ds = lambda c: ChapterTitleDataset(
            c, tokenizer, cfg.data.title_input_len,
            cfg.data.title_decode_len, cfg.train.seed,
        )

    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(tokenizer))

    train_loader = DataLoader(make_ds(corpus), cfg.data.batch_size,
                              seed=cfg.train.seed)
    val_loader = DataLoader(make_ds(val_corpus), cfg.data.batch_size,
                            shuffle=False, drop_last=False)
    trainer = Trainer(cfg=cfg, task=task, train_loader=train_loader,
                      eval_loader=val_loader)
    metrics = trainer.train()
    print("final:", metrics)
    trainer.ckpt.close()


if __name__ == "__main__":
    main()
