"""Block-sparse attention tests: locality pattern, global rows, masking,
and the BigBird-Pegasus seq2seq variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.sparse_attention import (
    block_sparse_attention,
)


def full_attention(q, k, v, mask):
    hd = q.shape[-1]
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.asarray(hd, q.dtype))
    att = att + (1.0 - mask[:, None, None, :].astype(att.dtype)) * -1e9
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def make_qkv(b=1, l=64, h=2, hd=8, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.standard_normal((b, l, h, hd)).astype(np.float32))
        for _ in range(3)
    ]


def test_small_sequence_falls_back_to_full():
    q, k, v = make_qkv(l=32)
    mask = jnp.ones((1, 32), jnp.int32)
    out = block_sparse_attention(q, k, v, mask, block_size=8,
                                 num_rand_blocks=2)
    ref = full_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_sparse_pattern_locality():
    """A far-away non-global, non-random key must NOT influence a local
    query; a window-neighbor key must."""
    q, k, v = make_qkv(l=128)
    mask = jnp.ones((1, 128), jnp.int32)
    bs = 8  # 16 blocks > 3+1+0 -> sparse path
    out = block_sparse_attention(q, k, v, mask, block_size=bs,
                                 num_rand_blocks=0)

    # query block 8 attends blocks {7,8,9} + global {0}
    probe = 8 * bs + 3
    # perturb a key/value in block 4 (not attended by block 8)
    k2 = k.at[:, 4 * bs + 2].add(10.0)
    v2 = v.at[:, 4 * bs + 2].add(10.0)
    out2 = block_sparse_attention(q, k2, v2, mask, block_size=bs,
                                  num_rand_blocks=0)
    np.testing.assert_allclose(np.asarray(out[:, probe]),
                               np.asarray(out2[:, probe]), atol=1e-6)
    # but block 7 IS attended
    k3 = k.at[:, 7 * bs + 2].add(10.0)
    out3 = block_sparse_attention(q, k3, v, mask, block_size=bs,
                                  num_rand_blocks=0)
    assert float(jnp.abs(out[:, probe] - out3[:, probe]).max()) > 1e-4


def test_global_rows_attend_everywhere():
    q, k, v = make_qkv(l=128)
    mask = jnp.ones((1, 128), jnp.int32)
    out = block_sparse_attention(q, k, v, mask, block_size=8,
                                 num_rand_blocks=0)
    ref = full_attention(q, k, v, mask)
    # first (global) block rows equal full attention
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(ref[:, :8]),
                               rtol=1e-5, atol=1e-5)


def test_padding_masked():
    q, k, v = make_qkv(l=128)
    mask = jnp.ones((1, 128), jnp.int32).at[:, 64:].set(0)
    out = block_sparse_attention(q, k, v, mask, block_size=8,
                                 num_rand_blocks=1)
    # perturbing padded keys changes nothing
    k2 = k.at[:, 100].add(50.0)
    v2 = v.at[:, 100].add(50.0)
    out2 = block_sparse_attention(q, k2, v2, mask, block_size=8,
                                  num_rand_blocks=1)
    np.testing.assert_allclose(np.asarray(out[:, :64]),
                               np.asarray(out2[:, :64]), atol=1e-5)


def test_bigbird_seq2seq_variant():
    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        Seq2SeqConfig,
    )

    cfg = Seq2SeqConfig.tiny(
        vocab_size=64, max_positions=128,
        encoder_attention="block_sparse", block_size=8, num_rand_blocks=1,
    )
    model = Seq2Seq(cfg)
    ids = jnp.ones((1, 128), jnp.int32)
    mask = jnp.ones((1, 128), jnp.int32)
    dec = jnp.zeros((1, 4), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), ids, mask, dec)
    logits = model.apply(v, ids, mask, dec)
    assert logits.shape == (1, 4, 64)
    assert np.isfinite(np.asarray(logits)).all()
