"""Tokenizer parity tests.

WordPieceTokenizer is checked differentially against HuggingFace's
BertTokenizer constructed from the same local vocab file (slow python
implementation, no network) — this validates the full BasicTokenizer +
WordPiece pipeline used by the reference datasets.
"""

import os

import numpy as np
import pytest

from video_chapter_generation_tpu.data import (
    UnigramTokenizer,
    WordPieceTokenizer,
    encode_clip_text,
    encode_encoder_text,
    encode_title_decoder,
)

VOCAB = (
    list(WordPieceTokenizer.SPECIALS)
    + list("abcdefghijklmnopqrstuvwxyz0123456789.,!?'-")
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    + [
        "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
        "over", "lazy", "dog", "video", "chapter", "intro", "##duction",
        "hello", "world", "un", "##wanted", "##affable", "run",
    ]
)

SAMPLES = [
    "The quick brown fox jumps over the lazy dog",
    "hello world!",
    "introduction",
    "unaffable",
    "Hello, WORLD?! it's running...",
    "héllo wörld",          # accents stripped
    "汉字 mixed with text",  # CJK chars split out (unknown -> [UNK])
    "[CLS] hello world",    # specials stay atomic
    "",
    "    spaces   everywhere   ",
    "weird control\x00�chars",
    "a" * 150,              # longer than max_input_chars_per_word -> UNK
]


@pytest.fixture(scope="module")
def wp():
    return WordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return transformers.BertTokenizer(
        vocab_file=str(path), do_lower_case=True, do_basic_tokenize=True
    )


def test_wordpiece_matches_hf_bert(wp, hf_tok):
    for s in SAMPLES:
        ours = wp.tokenize(s)
        theirs = hf_tok.tokenize(s)
        assert ours == theirs, f"mismatch on {s!r}: {ours} vs {theirs}"
        assert wp.convert_tokens_to_ids(ours) == hf_tok.convert_tokens_to_ids(theirs)


def test_wordpiece_basics(wp):
    assert wp.tokenize("jumps") == ["jump", "##s"]
    assert wp.tokenize("introduction") == ["intro", "##duction"]
    ids = wp.convert_tokens_to_ids(["[CLS]", "hello", "[PAD]"])
    assert ids[0] == VOCAB.index("[CLS]")
    assert wp.decode(wp.convert_tokens_to_ids(wp.tokenize("hello world"))) == "hello world"


def test_encode_clip_text_contract(wp):
    ids, mask = encode_clip_text("hello world", wp, max_text_len=8)
    assert ids.shape == (8,) and mask.shape == (8,)
    # [CLS] hello world -> 3 tokens, rest PAD
    assert list(mask) == [1, 1, 1, 0, 0, 0, 0, 0]
    assert ids[0] == VOCAB.index("[CLS]")
    assert ids[3] == VOCAB.index("[PAD]")
    # truncation
    ids2, mask2 = encode_clip_text("the quick brown fox jumps over", wp, max_text_len=4)
    assert list(mask2) == [1, 1, 1, 1]


# ---------------- unigram ----------------

@pytest.fixture(scope="module")
def uni():
    corpus = ["hello world", "video chapter title generation", "deep learning models"]
    return UnigramTokenizer.build_from_corpus(corpus)


def test_unigram_roundtrip(uni):
    toks = uni.tokenize("hello world")
    assert toks[0].startswith(UnigramTokenizer.WS)
    ids = uni.convert_tokens_to_ids(toks)
    assert uni.decode(ids) == "hello world"


def test_unigram_prefers_whole_words(uni):
    assert uni.tokenize("hello") == ["▁hello"]


def test_unigram_unknown_chars(uni):
    # unseen chars segment as single chars and map to <unk> (SP semantics:
    # unknown content is lost on decode)
    toks = uni.tokenize("zzz qqq")
    ids = uni.convert_tokens_to_ids(toks)
    unk = uni.vocab[uni.unk_token]
    assert unk in ids
    assert uni.decode(ids) == ""


def test_title_decoder_contract(uni):
    out = encode_title_decoder("video chapter", uni, chapter_title_text_len=6)
    ids_in = out["input_decode_ids"]
    ids_tgt = out["target_decode_ids"]
    mask = out["decode_attention_mask"]
    assert ids_in.shape == (6,) and ids_tgt.shape == (6,) and mask.shape == (6,)
    # decoder starts with pad (BOS), target ends with EOS then EOS padding
    assert ids_in[0] == uni.pad_id
    n_toks = len(uni.tokenize("video chapter"))
    assert list(mask[: n_toks + 1]) == [1] * (n_toks + 1)
    assert ids_tgt[n_toks] == uni.eos_id
    # shifted alignment: target[i] == input[i+1] within the title
    assert list(ids_tgt[: n_toks]) == list(ids_in[1 : n_toks + 1])


def test_title_decoder_long_title_truncates_with_eos(uni):
    long_title = "video chapter title generation deep learning models hello world"
    out = encode_title_decoder(long_title, uni, chapter_title_text_len=4)
    assert out["target_decode_ids"].shape == (4,)
    assert out["target_decode_ids"][3] == uni.eos_id
    assert list(out["decode_attention_mask"]) == [1, 1, 1, 1]


def test_encoder_text_contract(uni):
    ids, mask = encode_encoder_text("hello world", uni, max_text_len=5)
    n = len(uni.tokenize("hello world"))
    assert list(mask) == [1] * n + [0] * (5 - n)
    assert ids[-1] == uni.pad_id
