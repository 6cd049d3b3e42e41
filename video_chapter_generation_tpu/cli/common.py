"""Shared CLI plumbing: config parsing, corpus/tokenizer construction."""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import List, Optional, Tuple

from ..core.config import Config
from ..data.corpus import VideoCorpus
from ..data.tokenization import UnigramTokenizer, WordPieceTokenizer

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s %(message)s",
)


def parse_config(argv: Optional[List[str]] = None,
                 description: str = "") -> Tuple[Config, argparse.Namespace]:
    """Flags: --config <json file> plus any number of a.b=c overrides."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config file")
    parser.add_argument("--bert_vocab", type=str, default=None,
                        help="path to a BERT vocab.txt")
    parser.add_argument("--spm_tsv", type=str, default=None,
                        help="path to a sentencepiece piece<TAB>score export")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model configs (CI / smoke)")
    parser.add_argument("overrides", nargs="*", help="a.b=c overrides")
    args = parser.parse_args(argv)

    cfg = Config()
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_dict(json.load(f))
    if args.overrides:
        cfg = cfg.apply_overrides(args.overrides)
    return cfg, args


def load_corpus(cfg: Config, split: str = "train") -> VideoCorpus:
    vid_file = {
        "train": cfg.data.train_vid_file,
        "val": cfg.data.val_vid_file,
        "test": cfg.data.test_vid_file,
    }[split]
    return VideoCorpus.from_files(
        cfg.data.img_dir, cfg.data.data_file, vid_file, cfg.data.subtitle_dir
    )


def load_bert_tokenizer(args, corpus: Optional[VideoCorpus] = None):
    if args.bert_vocab:
        return WordPieceTokenizer.from_vocab_file(args.bert_vocab)
    if corpus is not None:  # fallback: corpus-built vocab (no vocab file)
        texts = []
        for vid in corpus.vids[:200]:
            texts += [s["text"] for s in corpus.subtitles(vid)]
        return WordPieceTokenizer.build_from_corpus(texts, vocab_size=8000)
    raise SystemExit("--bert_vocab required (no corpus to build one from)")


def load_title_tokenizer(args, corpus: Optional[VideoCorpus] = None):
    if args.spm_tsv:
        return UnigramTokenizer.from_tsv(args.spm_tsv)
    if corpus is not None:
        texts = []
        for vid in corpus.vids[:200]:
            texts += [s["text"] for s in corpus.subtitles(vid)]
        return UnigramTokenizer.build_from_corpus(texts, vocab_size=8000)
    raise SystemExit("--spm_tsv required (no corpus to build one from)")
