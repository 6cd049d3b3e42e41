"""Block-sparse (BigBird-style) attention, TPU-native.

Covers the reference's long-context option PegasusBigBirdHugface
(model/lang/pegasus_bigbird.py:19 — 'google/bigbird-pegasus-large-arxiv'):
sparse encoder self-attention at O(L * w * block) instead of O(L^2).

The layout reproduces HF BigBirdPegasus's ITC scheme EXACTLY (verified by
differential test vs `BigBirdPegasusBlockSparseAttention` at
num_rand_blocks=0 — tests/test_sparse_attention.py):

- query block 0 and query block nb-1 attend the FULL sequence;
- key blocks 0 and nb-1 are global: every query block attends them;
- query block 1 attends {0, 1, 2, nb-1}; query block nb-2 attends
  {0, nb-3, nb-2, nb-1}; middle blocks i attend {0, i-1, i, i+1, nb-1};
- plus num_rand_blocks "random" blocks per query block. HF draws these
  per-head/per-layer from a numpy RNG plan; here they are a
  seed-derived static map shared across heads (deterministic stand-in —
  exact HF parity therefore holds at num_rand_blocks=0);
- padding enters as an additive -10000 penalty on scaled scores (HF's
  attn_mask_penalty) and padded QUERY rows are zeroed on the way out.

Implementation notes (TPU-first):
- all gathers are static-index jnp.take along the block axis (shapes are
  static; the random pattern is a seed-derived constant folded at trace
  time), so XLA lowers to cheap dynamic-slices feeding one batched MXU
  attention over the gathered keys;
- duplicate attended blocks are deduplicated with a validity mask (HF's
  per-row concatenations never contain duplicates, so dedup + mask is
  exactly its softmax domain).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# HF BigBirdPegasus masks padding with an additive -10000 on the scaled
# scores (modeling_bigbird_pegasus.py `attn_mask_penalty`); exp(-10000)
# underflows to exactly 0 in f32, so this matches a hard mask while
# keeping bit-parity with HF.
MASK_PENALTY = -10000.0


def _random_block_map(n_blocks: int, num_rand: int, seed: int) -> np.ndarray:
    """[n_blocks, num_rand] static random attended-block indices, excluding
    each query block's own window and the global first/last blocks."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n_blocks, max(num_rand, 0)), np.int32)
    for qb in range(n_blocks):
        banned = {0, qb - 1, qb, qb + 1, n_blocks - 1}
        candidates = [b for b in range(n_blocks) if b not in banned]
        if not candidates:
            candidates = [qb]
        pick = rng.choice(
            candidates, size=min(num_rand, len(candidates)), replace=False
        )
        row = np.resize(pick, num_rand) if num_rand else pick
        out[qb] = row
    return out


def _full_attention(q, k, v, mask, scale):
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    att = att + (1.0 - mask[:, None, None, :].astype(att.dtype)) * MASK_PENALTY
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def block_sparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    block_size: int = 64,
    num_rand_blocks: int = 2,
    num_global_blocks: int = 1,
    seed: int = 0,
    rand_map: Optional[np.ndarray] = None,
    impl: str = "auto",
) -> jax.Array:
    """q,k,v: [B, L, H, hd]; mask: [B, L] (1 keep / 0 pad) or None.
    Returns [B, L, H, hd]. L must be divisible by block_size.

    num_global_blocks is part of the stable API but the HF ITC layout
    fixes globals at one block on EACH end; only 1 is supported.

    rand_map: optional [nb, num_rand_blocks] numpy override of the
    random attended-block indices per query block (rows 0 and nb-1
    unused) — used by the HF differential test to inject HF's own
    np.random plan; production uses the seed-derived default.

    impl: 'gather' = XLA static-gather einsums; 'kernel' = fused
    flash-style Pallas kernel (ops/sparse_attention_pallas.py — no
    materialized key gather, online softmax); 'auto' = kernel on TPU
    when the block shape tiles (bs/hd multiples of 8), gather elsewhere.
    """
    assert num_global_blocks == 1, (
        "HF BigBirdPegasus ITC layout: exactly one global block at each "
        f"end (got num_global_blocks={num_global_blocks})")
    b, l, h, hd = q.shape
    assert l % block_size == 0, (l, block_size)
    nb = l // block_size
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, q.dtype))

    if mask is None:
        mask = jnp.ones((b, l), jnp.int32)

    # HF's encoder falls back to full attention when the sparse pattern
    # would cover everything (seq_len <= (5 + 2*rand) * block, i.e. the
    # band+globals span the row); same rule here at block granularity.
    if nb <= 5 + 2 * num_rand_blocks:
        return _full_attention(q, k, v, mask, scale)

    qb = q.reshape(b, nb, block_size, h, hd)
    kb = k.reshape(b, nb, block_size, h, hd)
    vb = v.reshape(b, nb, block_size, h, hd)
    mb = mask.reshape(b, nb, block_size)

    # attended block ids per sparse query block 1..nb-2 (deduplicated so
    # softmax never counts a key twice; invalid padding slots masked)
    if rand_map is None:
        rand_map = (
            _random_block_map(nb, num_rand_blocks, seed)
            if num_rand_blocks > 0 else None
        )
    rows, valids = [], []
    n_att = 5 + num_rand_blocks
    for q_block in range(1, nb - 1):
        # deterministic part {global-first, band, global-last}: HF's
        # per-row concatenations merge band/global overlap at the edge
        # rows (its row-1 key set is [k0,k1,k2,k_last] — one k0), so
        # dedup applies here. Rand blocks append VERBATIM: HF gathers
        # them unconditionally, double-counting a key block when its
        # np.random plan collides with the window/globals — keep that
        # exact softmax domain.
        det = list(dict.fromkeys(
            [0, q_block - 1, q_block, q_block + 1, nb - 1]))
        rand = list(rand_map[q_block]) if rand_map is not None else []
        uniq = det + rand
        valid = [1] * len(uniq) + [0] * (n_att - len(uniq))
        uniq = uniq + [uniq[0]] * (n_att - len(uniq))
        rows.append(uniq)
        valids.append(valid)
    att_ids_np = np.asarray(rows, np.int32)    # [nb-2, n_att]
    valid_np = np.asarray(valids, np.int32)    # [nb-2, n_att]

    use_kernel = impl == "kernel" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and block_size % 8 == 0
        and hd % 8 == 0
    )
    if use_kernel:
        from ..ops.sparse_attention_pallas import (
            penalty_for_structured_ids,
            sparse_band_attention_pallas,
            structured_ids,
        )

        sids, svalid = structured_ids(nb, rand_map)
        penalty = penalty_for_structured_ids(mask, sids, svalid, block_size)
        rand_ids = (np.asarray(rand_map, np.int32)[1:-1]
                    if rand_map is not None
                    else np.zeros((nb - 2, 0), np.int32))
        out = sparse_band_attention_pallas(
            q[:, block_size:-block_size], k, v, penalty,
            jnp.asarray(rand_ids), block_size,
        )
    else:
        att_ids = jnp.asarray(att_ids_np)
        valid = jnp.asarray(valid_np)

        # gather attended keys/values/masks: [b, nb-2, n_att*bs, h, hd]
        kg = jnp.take(kb, att_ids, axis=1).reshape(
            b, nb - 2, n_att * block_size, h, hd
        )
        vg = jnp.take(vb, att_ids, axis=1).reshape(
            b, nb - 2, n_att * block_size, h, hd
        )
        mg = jnp.take(mb, att_ids, axis=1)  # [b, nb-2, n_att, bs]
        mg = (mg * valid[None, :, :, None]).reshape(b, nb - 2,
                                                    n_att * block_size)

        qs = qb[:, 1:-1]  # sparse query blocks
        att = jnp.einsum("bnqhd,bnkhd->bnhqk", qs, kg) * scale
        att = att + (1.0 - mg[:, :, None, None, :].astype(att.dtype)) \
            * MASK_PENALTY
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", att, vg)
        out = out.reshape(b, (nb - 2) * block_size, h, hd)

    # first and last query blocks attend the FULL sequence
    out_first = _full_attention(q[:, :block_size], k, v, mask, scale)
    out_last = _full_attention(q[:, -block_size:], k, v, mask, scale)
    out = jnp.concatenate([out_first, out, out_last], axis=1)
    # HF zeroes padded QUERY rows (context_layer * from_mask)
    return out * mask[:, :, None, None].astype(out.dtype)
