"""GloVe embedding loaders (data/common_utils.py:112-131) — used by the
from-scratch GPT's pretrained-embedding input mode."""

from __future__ import annotations

import pickle
from typing import Dict

import numpy as np


def load_glove_txt(path: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            try:
                vec = np.asarray([float(x) for x in parts[1:]], np.float32)
            except ValueError:
                continue
            if len(vec):
                out[parts[0]] = vec
    return out


def load_glove_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_glove_pickle(emb: Dict[str, np.ndarray], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(emb, f, protocol=pickle.HIGHEST_PROTOCOL)


def embed_tokens(tokens, table: Dict[str, np.ndarray],
                 dim: int = 300) -> np.ndarray:
    """Token list -> [L, dim]; OOV tokens get zeros."""
    out = np.zeros((len(tokens), dim), np.float32)
    for i, t in enumerate(tokens):
        v = table.get(t)
        if v is not None:
            out[i] = v[:dim]
    return out


def build_word_vocab(corpus) -> list:
    """Word-level vocab from a corpus's subtitles (lowercase, decontracted,
    whitespace-split, sorted) — the no-GloVe fallback for the from-scratch
    GPT (the reference builds dataset.token2id the same way from its
    subtitle set, train_lang/pretrain_lang_model.py)."""
    from .parsing import text_decontracted

    words = set()
    for vid in corpus.vids:
        for sub in corpus.subtitles(vid):
            text = text_decontracted(str(sub.get("text", "")).lower())
            words.update(w for w in text.split(" ") if w)
    return sorted(words)
