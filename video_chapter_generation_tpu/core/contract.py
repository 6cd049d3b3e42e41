"""Checkpoint-carried train/eval config contract.

The reference couples its train and test drivers only by convention —
test_video_segment_point.py:56-66 must be launched with the same
clip_frame_num/window_size/data_mode the checkpoint was trained with, and
nothing checks it: a mismatch (e.g. frame resolution) silently degrades
into a metrics regression. Round 4 hit exactly that class of bug
(eval_segment zeroing the vision stream on a frame-hw mismatch).

Here the contract travels INSIDE the checkpoint (orbax per-step metrics
metadata, core/checkpoint.py): training tasks publish a dict of the
config values that must match at load (frame hw, clip_frame_num,
window_size, max_text_len, vocab hash, model kind/head, ...), the
Trainer persists it with every save, and the eval/infer CLIs assert it
against their own runtime config — a mismatch is a hard, named failure
instead of silently wrong metrics.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

CONTRACT_KEY = "contract"


class ContractMismatch(RuntimeError):
    pass


def build_contract(**fields) -> Dict:
    """JSON-safe contract dict; None-valued fields are dropped."""
    out = {}
    for k, v in fields.items():
        if v is None:
            continue
        if hasattr(v, "item"):  # numpy scalar
            v = v.item()
        out[k] = v
    return out


def vocab_hash(tokenizer) -> Optional[str]:
    """Stable hash of a tokenizer's vocabulary — or of a plain word list
    (the from-scratch GPT's word-level vocab). Order-sensitive: ids must
    map to the same tokens, not just the same set."""
    if isinstance(tokenizer, (list, tuple)):
        vocab = list(tokenizer)
    else:
        vocab = getattr(tokenizer, "vocab", None)
    if isinstance(vocab, dict):  # token -> id; hash in id order
        toks = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    elif vocab is not None:
        toks = list(vocab)
    else:
        return None
    h = hashlib.md5()
    for tok in toks:
        h.update(str(tok).encode("utf-8"))
        h.update(b"\0")
    return h.hexdigest()[:16]


def assert_contract(saved: Optional[Dict], current: Dict,
                    context: str = "checkpoint") -> None:
    """Hard-fail on any key present in BOTH dicts with different values.

    `saved` None/empty (pre-contract checkpoints) passes — the contract
    is advisory-absent, never silently wrong.
    """
    if not saved:
        return
    mismatches = [
        (k, saved[k], current[k])
        for k in sorted(current)
        if k in saved and saved[k] != current[k]
    ]
    if mismatches:
        lines = "\n".join(
            f"  {k}: checkpoint={s!r} vs current={c!r}"
            for k, s, c in mismatches
        )
        raise ContractMismatch(
            f"{context}: config does not match the checkpoint's training "
            f"contract:\n{lines}\n"
            "Fix the flags/config to match the checkpoint (or retrain)."
        )
