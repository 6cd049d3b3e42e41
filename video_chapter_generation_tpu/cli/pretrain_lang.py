"""Subtitle language-model pretraining (MLM / next-token / GPT / GloVe-GPT).

Replaces pretrain_lang_model_hugface.py and train_lang/: `--task mlm` or
`--task next_token` pretrain the BERT stack on subtitle windows;
`--task next_token_gpt [--glove_vocab vocab.txt]` trains the from-scratch
GPT on word-level token ids (pretrain_lang_model.py use_glove_emb=False;
vocab built from the corpus when no file is given);
`--task next_token_glove --glove emb.pkl --glove_vocab vocab.txt` trains
the from-scratch GPT on GloVe word embeddings
(train_lang/pretrain_lang_model.py + model/lang/gpt.py:109-117).
Sample continuations from any of these checkpoints with
cli/sample_lang.py (the test_gpt.py:109 analogue).

    python -m video_chapter_generation_tpu.cli.pretrain_lang \
        data.data_file=... data.train_vid_file=... --bert_vocab v.txt \
        --task mlm
"""

from __future__ import annotations

from ..data.datasets import (
    GloveSubtitleDataset,
    SubtitlePretrainDataset,
    WordIdSubtitleDataset,
)
from ..data.loader import DataLoader
from ..train.loop import Trainer
from ..train.tasks import (
    GptGlovePretrainTask,
    GptPretrainTask,
    LangPretrainTask,
)
from .common import load_bert_tokenizer, load_corpus, parse_config


def load_word_vocab(glove_vocab, corpus):
    """Word-level vocab from a file (one word per line) or the corpus."""
    if glove_vocab:
        with open(glove_vocab) as f:
            return [x.strip() for x in f if x.strip()]
    from ..datasetkit.glove import build_word_vocab

    return build_word_vocab(corpus)


def main(argv=None):
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    task_name, glove_path, glove_vocab = "mlm", None, None
    if "--task" in argv:
        i = argv.index("--task")
        task_name = argv[i + 1]
        del argv[i : i + 2]
    if "--glove" in argv:
        i = argv.index("--glove")
        glove_path = argv[i + 1]
        del argv[i : i + 2]
    if "--glove_vocab" in argv:
        i = argv.index("--glove_vocab")
        glove_vocab = argv[i + 1]
        del argv[i : i + 2]

    cfg, args = parse_config(argv, "subtitle LM pretraining")
    corpus = load_corpus(cfg, "train")

    if task_name == "next_token_gpt":
        vocab = load_word_vocab(glove_vocab, corpus)
        task = GptPretrainTask(cfg, vocab_size=len(vocab), tiny=args.tiny)
        ds = WordIdSubtitleDataset(
            corpus, vocab, clip_frame_num=cfg.data.clip_frame_num,
            max_text_len=cfg.data.max_text_len, seed=cfg.train.seed,
        )
    elif task_name == "next_token_glove":
        from ..datasetkit.glove import load_glove_pickle, load_glove_txt

        table = (load_glove_pickle(glove_path)
                 if glove_path.endswith((".pkl", ".pickle"))
                 else load_glove_txt(glove_path))
        if glove_vocab:
            with open(glove_vocab) as f:
                vocab = [x.strip() for x in f if x.strip()]
        else:
            vocab = sorted(table)
        emb_dim = len(next(iter(table.values())))
        task = GptGlovePretrainTask(cfg, vocab_size=len(vocab),
                                    tiny=args.tiny, emb_dim=emb_dim)
        ds = GloveSubtitleDataset(
            corpus, table, vocab, clip_frame_num=cfg.data.clip_frame_num,
            max_text_len=cfg.data.max_text_len, emb_dim=emb_dim,
            seed=cfg.train.seed,
        )
    else:
        tokenizer = load_bert_tokenizer(args, corpus)
        task = LangPretrainTask(cfg, vocab_size=tokenizer.vocab_size,
                                tiny=args.tiny)
        ds = SubtitlePretrainDataset(
            corpus, tokenizer, task=task_name,
            max_text_len=cfg.data.max_text_len, seed=cfg.train.seed,
        )
    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(
        vocab if task_name.startswith("next_token_g") else tokenizer))

    loader = DataLoader(ds, cfg.data.batch_size, seed=cfg.train.seed)
    trainer = Trainer(cfg=cfg, task=task, train_loader=loader)
    print("final:", trainer.train())
    trainer.ckpt.close()


if __name__ == "__main__":
    main()
