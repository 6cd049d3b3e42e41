"""Tokenizer export tool tests (WordPiece + Unigram tokenizer.json)."""

import json

from video_chapter_generation_tpu.cli.export_tokenizer import export
from video_chapter_generation_tpu.data.tokenization import (
    UnigramTokenizer,
    WordPieceTokenizer,
)


def test_wordpiece_export(tmp_path):
    tok_json = {
        "model": {
            "type": "WordPiece",
            "vocab": {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                      "[MASK]": 4, "hello": 5, "world": 6, "##s": 7},
        }
    }
    src = tmp_path / "tokenizer.json"
    src.write_text(json.dumps(tok_json))
    out = tmp_path / "vocab.txt"
    assert export(str(src), str(out)) == "wordpiece"
    wp = WordPieceTokenizer.from_vocab_file(str(out))
    assert wp.tokenize("hello worlds") == ["hello", "world", "##s"]
    assert wp.convert_tokens_to_ids(["hello"]) == [5]


def test_unigram_export(tmp_path):
    tok_json = {
        "model": {
            "type": "Unigram",
            "vocab": [["<pad>", 0.0], ["</s>", 0.0], ["<unk>", -2.0],
                      ["▁hello", -1.5], ["▁world", -1.8],
                      ["h", -9.0], ["▁", -5.0]],
        }
    }
    src = tmp_path / "tokenizer.json"
    src.write_text(json.dumps(tok_json))
    out = tmp_path / "pieces.tsv"
    assert export(str(src), str(out)) == "unigram"
    uni = UnigramTokenizer.from_tsv(str(out))
    assert uni.tokenize("hello") == ["▁hello"]
    assert uni.pad_id == 0 and uni.eos_id == 1
