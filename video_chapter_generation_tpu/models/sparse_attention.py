"""Block-sparse (BigBird-style) attention, TPU-native.

Covers the reference's long-context option PegasusBigBirdHugface
(model/lang/pegasus_bigbird.py:19 — 'google/bigbird-pegasus-large-arxiv'):
each query block attends to its sliding window (left/self/right), the
global block(s), and a deterministic set of "random" blocks, giving
O(L * w * block) instead of O(L^2).

Implementation notes (TPU-first):
- all gathers are static-index jnp.take along the block axis (shapes are
  static; the random pattern is a seed-derived constant folded at trace
  time), so XLA lowers to cheap dynamic-slices feeding one batched MXU
  attention over the gathered keys;
- global blocks also ATTEND to everything (full row), matching BigBird's
  ITC layout with the first block global.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _random_block_map(n_blocks: int, num_rand: int, seed: int) -> np.ndarray:
    """[n_blocks, num_rand] static random attended-block indices, excluding
    each query block's own window and the global block."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n_blocks, max(num_rand, 0)), np.int32)
    for qb in range(n_blocks):
        banned = {0, qb - 1, qb, qb + 1}
        candidates = [b for b in range(n_blocks) if b not in banned]
        if not candidates:
            candidates = [qb]
        pick = rng.choice(
            candidates, size=min(num_rand, len(candidates)), replace=False
        )
        row = np.resize(pick, num_rand) if num_rand else pick
        out[qb] = row
    return out


def block_sparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    block_size: int = 64,
    num_rand_blocks: int = 2,
    num_global_blocks: int = 1,
    seed: int = 0,
) -> jax.Array:
    """q,k,v: [B, L, H, hd]; mask: [B, L] (1 keep / 0 pad) or None.
    Returns [B, L, H, hd]. L must be divisible by block_size."""
    b, l, h, hd = q.shape
    assert l % block_size == 0, (l, block_size)
    nb = l // block_size
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, q.dtype))

    if mask is None:
        mask = jnp.ones((b, l), jnp.int32)

    if nb <= 3 + num_global_blocks + num_rand_blocks:
        # sparse pattern would cover everything — fall back to full attn
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        att = att + (1.0 - mask[:, None, None, :].astype(att.dtype)) * -1e9
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", att, v)

    qb = q.reshape(b, nb, block_size, h, hd)
    kb = k.reshape(b, nb, block_size, h, hd)
    vb = v.reshape(b, nb, block_size, h, hd)
    mb = mask.reshape(b, nb, block_size)

    # attended block ids per query block (deduplicated so softmax never
    # counts a key twice; invalid padding slots masked): [nb, n_att]
    rand_map = (
        _random_block_map(nb, num_rand_blocks, seed)
        if num_rand_blocks > 0 else None
    )
    rows, valids = [], []
    n_att = 3 + num_global_blocks + num_rand_blocks
    for q_block in range(nb):
        cand = [max(q_block - 1, 0), q_block, min(q_block + 1, nb - 1)]
        cand += list(range(num_global_blocks))
        if rand_map is not None:
            cand += list(rand_map[q_block])
        uniq = list(dict.fromkeys(cand))
        valid = [1] * len(uniq) + [0] * (n_att - len(uniq))
        uniq = uniq + [uniq[0]] * (n_att - len(uniq))
        rows.append(uniq)
        valids.append(valid)
    att_ids = jnp.asarray(np.asarray(rows, np.int32))  # [nb, n_att]
    valid = jnp.asarray(np.asarray(valids, np.int32))  # [nb, n_att]

    # gather attended keys/values/masks: [b, nb, n_att*bs, h, hd]
    kg = jnp.take(kb, att_ids, axis=1).reshape(
        b, nb, n_att * block_size, h, hd
    )
    vg = jnp.take(vb, att_ids, axis=1).reshape(
        b, nb, n_att * block_size, h, hd
    )
    mg = jnp.take(mb, att_ids, axis=1)  # [b, nb, n_att, bs]
    mg = (mg * valid[None, :, :, None]).reshape(b, nb, n_att * block_size)

    att = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, kg) * scale
    att = att + (1.0 - mg[:, :, None, None, :].astype(att.dtype)) * -1e9
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", att, vg)
    out = out.reshape(b, l, h, hd)

    # global blocks attend to the FULL sequence (overwrite their rows)
    g = num_global_blocks * block_size
    att_g = jnp.einsum("bqhd,bkhd->bhqk", q[:, :g], k) * scale
    att_g = att_g + (1.0 - mask[:, None, None, :].astype(att_g.dtype)) * -1e9
    att_g = jax.nn.softmax(att_g, axis=-1)
    out_g = jnp.einsum("bhqk,bkhd->bqhd", att_g, v)
    return jnp.concatenate([out_g, out[:, g:]], axis=1)
