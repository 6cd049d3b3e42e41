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
    parser.add_argument("--title_arch", type=str, default="pegasus",
                        choices=("pegasus", "bigbird", "bart"),
                        help="title-model family (pegasus_hugface.py / "
                        "pegasus_bigbird.py / bart_hugface.py analogues); "
                        "bigbird = block-sparse long-context encoder — "
                        "raise data.title_input_len (e.g. 3072) to use it. "
                        "NOTE: the random-block plan is a seed-derived map "
                        "shared across heads, unlike HF's per-head/per-layer "
                        "np.random plan — HF-converted BigBirdPegasus "
                        "checkpoints reproduce HF outputs exactly only at "
                        "num_rand_blocks=0 or with injected HF rand maps "
                        "(models/sparse_attention.py docstring)")
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


def title_s2s_config(args, tokenizer):
    """Seq2SeqConfig for the selected --title_arch at the selected size.

    The reference ships three title families (train_chapter_title_gen.py
    model_type pegasus|bigbird|bart); `bigbird` here maps to the
    block-sparse long-context encoder (models/sparse_attention.py)."""
    import dataclasses

    from ..models.seq2seq import Seq2SeqConfig

    arch = getattr(args, "title_arch", "pegasus")
    if args.tiny:
        kw = dict(vocab_size=tokenizer.vocab_size)
        if arch == "bigbird":
            kw.update(
                max_positions=256, encoder_attention="block_sparse",
                block_size=16, num_rand_blocks=1, activation="gelu_new",
                learned_positions=True, decoder_start_token_id=2,
                attention_bias=False,
            )
        elif arch == "bart":
            kw.update(
                activation="gelu", pre_norm=False, learned_positions=True,
                position_offset=2, scale_embedding=False,
                embed_layernorm=True,
            )
        return Seq2SeqConfig.tiny(**kw)
    base = {
        "pegasus": Seq2SeqConfig.pegasus_large,
        "bigbird": Seq2SeqConfig.bigbird_pegasus_large,
        "bart": Seq2SeqConfig.bart_large,
    }[arch]()
    return dataclasses.replace(base, vocab_size=tokenizer.vocab_size)


def load_title_tokenizer(args, corpus: Optional[VideoCorpus] = None):
    if args.spm_tsv:
        return UnigramTokenizer.from_tsv(args.spm_tsv)
    if corpus is not None:
        texts = []
        for vid in corpus.vids[:200]:
            texts += [s["text"] for s in corpus.subtitles(vid)]
        return UnigramTokenizer.build_from_corpus(texts, vocab_size=8000)
    raise SystemExit("--spm_tsv required (no corpus to build one from)")
