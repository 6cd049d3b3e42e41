"""Fused flash-style block-sparse (BigBird ITC) attention kernel.

The XLA gather formulation (models/sparse_attention.py) materializes the
attended key/value blocks per query block — an [B, nb-2, n_att*bs, H, hd]
HBM intermediate that duplicates every key block ~n_att times and is
written + re-read around each einsum. At batch that duplication dominates
(PERF.md round 4: B=4/L=4096 sparse 370 ms vs full attention 199 ms).

This kernel never materializes the gather. One grid step = one
(batch, head, query block). The attended set of the ITC layout is
STRUCTURED — {global-first, band qi-1..qi+1, global-last, r rand blocks}
— so each part rides in as its own pipelined BlockSpec input DMA'd
straight from the full k/v arrays (band parts are affine in the grid
index; rand parts come off a scalar-prefetch id table; the globals'
index maps are grid-constant, so Mosaic re-uses them across steps
without re-fetching). The kernel concatenates the parts in VMEM and runs
ONE [bs, hd] x [hd, P*bs] score matmul + softmax + context matmul —
n_att x fewer grid steps than a per-(query,attended)-block walk, which
measured overhead-bound (306 ms; this file's v1).

Key-padding AND the structured layout's double-count corrections enter
as one precomputed additive penalty table (penalty_for_structured_ids):
the HF/gather softmax domain — dedup'd deterministic blocks, VERBATIM
rand blocks (HF double-counts rand/window collisions) — is reproduced
exactly; softmax reassociation makes parity allclose-level, pinned by
tests/test_sparse_attention.py against the gather formulation.

Reference being covered: model/lang/pegasus_bigbird.py:19 (HF
BigBirdPegasus block-sparse encoder); layout contract documented in
models/sparse_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_PENALTY = -10000.0


def structured_ids(nb: int, rand_map) -> tuple[np.ndarray, np.ndarray]:
    """Attended-block id table in STRUCTURED slot order for query blocks
    1..nb-2: [gfirst, band-1, band0, band+1, glast, rand...]. Returns
    (ids [nbq, P], valid [nbq, P]) where valid=0 marks the double-counted
    global slot at the band edges (the gather path's det-dedup)."""
    nbq = nb - 2
    r = 0 if rand_map is None else rand_map.shape[1]
    ids = np.zeros((nbq, 5 + r), np.int32)
    valid = np.ones((nbq, 5 + r), np.int32)
    for i in range(nbq):
        qi = i + 1  # actual query block id
        ids[i, :5] = [0, qi - 1, qi, qi + 1, nb - 1]
        if qi == 1:
            valid[i, 0] = 0  # band covers block 0: mask global-first
        if qi == nb - 2:
            valid[i, 4] = 0  # band covers block nb-1: mask global-last
        if r:
            ids[i, 5:] = rand_map[qi]  # verbatim (HF double-count kept)
    return ids, valid


def penalty_for_structured_ids(mask, ids, valid, block_size):
    """[B, nbq, 8, P*bs] additive score penalty: key padding plus the
    valid-slot correction, gathered once (tiny — no key duplication),
    replicated over 8 sublanes for Mosaic's (8, 128) tiling rule."""
    b = mask.shape[0]
    nbq, p = ids.shape
    mb = mask.reshape(b, -1, block_size)
    mg = jnp.take(mb, jnp.asarray(ids), axis=1)          # [B, nbq, P, bs]
    mg = mg * jnp.asarray(valid)[None, :, :, None]
    pen = (1.0 - mg.astype(jnp.float32)) * MASK_PENALTY
    pen = pen.reshape(b, nbq, 1, p * block_size)
    return jnp.broadcast_to(pen, (b, nbq, 8, p * block_size))


def _kernel(rand_ids_ref, q_ref, *refs, n_parts: int, scale: float):
    k_parts = refs[:n_parts]
    v_parts = refs[n_parts:2 * n_parts]
    pen_ref, o_ref = refs[2 * n_parts], refs[2 * n_parts + 1]

    q = q_ref[0, 0].astype(jnp.float32)                     # [bs, hd]
    k_all = jnp.concatenate(
        [r[0, 0] for r in k_parts], axis=0).astype(jnp.float32)
    v_all = jnp.concatenate(
        [r[0, 0] for r in v_parts], axis=0).astype(jnp.float32)
    pen = pen_ref[0, 0, :1, :]                              # [1, P*bs]

    s = jax.lax.dot_general(
        q, k_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + pen                                         # [bs, P*bs]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    ctx = jax.lax.dot_general(
        p, v_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0, 0] = ctx.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret"))
def sparse_band_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    penalty: jax.Array,
    rand_ids: jax.Array,
    block_size: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Middle (sparse) query blocks' attention, fused.

    q: [B, nbq*bs, H, hd] — query blocks 1..nb-2 of the full sequence;
    k, v: [B, L, H, hd] — FULL key/value arrays (blocks DMA'd on demand);
    penalty: [B, nbq, 8, P*bs] f32 additive penalty in structured slot
    order (penalty_for_structured_ids);
    rand_ids: [nbq, r] int32 rand block ids per query block (r may be 0).
    Returns [B, nbq*bs, H, hd] in q.dtype.
    """
    b, lq, h, hd = q.shape
    bs = block_size
    nbq = lq // bs
    nb = k.shape[1] // bs
    r = rand_ids.shape[1]
    n_parts = 5 + r
    scale = 1.0 / float(np.sqrt(hd))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Mosaic tiles the LAST TWO dims of each block: head-major layout so
    # blocks are [.., .., bs, hd]
    qT = q.transpose(0, 2, 1, 3)  # [B, H, Lq, hd]
    kT = k.transpose(0, 2, 1, 3)  # [B, H, L, hd]
    vT = v.transpose(0, 2, 1, 3)

    # one BlockSpec per structured part; the index map picks the part's
    # key block straight from the full array
    def part_index(p):
        if p == 0:
            return lambda bi, hi, qi, ids: (bi, hi, 0, 0)       # gfirst
        if p in (1, 2, 3):
            dj = p - 1
            return lambda bi, hi, qi, ids: (bi, hi, qi + dj, 0)  # band
        if p == 4:
            return lambda bi, hi, qi, ids: (bi, hi, nb - 1, 0)  # glast
        rj = p - 5
        return lambda bi, hi, qi, ids: (bi, hi, ids[qi, rj], 0)  # rand

    kv_spec = [
        pl.BlockSpec((1, 1, bs, hd), part_index(p)) for p in range(n_parts)
    ]
    grid = (b, h, nbq)
    kernel = functools.partial(_kernel, n_parts=n_parts, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(  # q: this query block
                    (1, 1, bs, hd),
                    lambda bi, hi, qi, ids: (bi, hi, qi, 0),
                ),
                *kv_spec,   # k parts
                *kv_spec,   # v parts
                pl.BlockSpec(  # precomputed structured penalty row
                    (1, 1, 8, n_parts * bs),
                    lambda bi, hi, qi, ids: (bi, qi, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bs, hd),
                lambda bi, hi, qi, ids: (bi, hi, qi, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(rand_ids, qT, *([kT] * n_parts), *([vT] * n_parts), penalty)
    return out.transpose(0, 2, 1, 3)
