"""Subtitle language-model pretraining (MLM / next-token).

Replaces pretrain_lang_model_hugface.py and train_lang/.

    python -m video_chapter_generation_tpu.cli.pretrain_lang \
        data.data_file=... data.train_vid_file=... --bert_vocab v.txt \
        --task mlm
"""

from __future__ import annotations

from ..data.datasets import SubtitlePretrainDataset
from ..data.loader import DataLoader
from ..train.loop import Trainer
from ..train.tasks import LangPretrainTask
from .common import load_bert_tokenizer, load_corpus, parse_config


def main(argv=None):
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    task_name = "mlm"
    if "--task" in argv:
        i = argv.index("--task")
        task_name = argv[i + 1]
        del argv[i : i + 2]

    cfg, args = parse_config(argv, "subtitle LM pretraining")
    corpus = load_corpus(cfg, "train")
    tokenizer = load_bert_tokenizer(args, corpus)

    task = LangPretrainTask(cfg, vocab_size=tokenizer.vocab_size,
                            tiny=args.tiny)
    ds = SubtitlePretrainDataset(
        corpus, tokenizer, task=task_name,
        max_text_len=cfg.data.max_text_len, seed=cfg.train.seed,
    )
    loader = DataLoader(ds, cfg.data.batch_size, seed=cfg.train.seed)
    trainer = Trainer(cfg=cfg, task=task, train_loader=loader)
    print("final:", trainer.train())
    trainer.ckpt.close()


if __name__ == "__main__":
    main()
