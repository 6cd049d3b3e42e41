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
    bs = 8  # 16 blocks > 5+0 -> sparse path
    out = block_sparse_attention(q, k, v, mask, block_size=bs,
                                 num_rand_blocks=0)

    # query block 8 attends band {7,8,9} + globals {0, 15} (HF ITC)
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
    # first AND last (global) block rows equal full attention (HF ITC)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(ref[:, :8]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, -8:]),
                               np.asarray(ref[:, -8:]), rtol=1e-5, atol=1e-5)


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


@pytest.fixture(scope="module")
def hf_bigbird():
    """Tiny BigBirdPegasus in block_sparse mode. HF's torch code crashes
    outright at num_random_blocks=0 (0-element gather reshape), so the
    differential runs WITH one random block and injects HF's own
    np.random plan into our implementation (single head so the per-head
    plan collapses to one shared map)."""
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = transformers.BigBirdPegasusConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=1, decoder_attention_heads=1,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=256, attention_type="block_sparse",
        block_size=16, num_random_blocks=1, dropout=0.0,
        activation_dropout=0.0, attention_dropout=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BigBirdPegasusForConditionalGeneration(cfg)
    model.eval()
    return model


def _bigbird_inputs(l=192, b=2, seed=0):
    # l = 12 blocks of 16 > HF's (5 + 2*rand) * block fallback threshold
    # (112 at rand=1), so block_sparse actually engages
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 128, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    if b > 1:
        mask[1, 150:] = 0
    return ids, mask


def _ours_bigbird_cfg(sparse_impl="auto"):
    from video_chapter_generation_tpu.models.seq2seq import Seq2SeqConfig

    return Seq2SeqConfig.tiny(
        vocab_size=128, max_positions=256,
        encoder_attention="block_sparse", block_size=16, num_rand_blocks=1,
        num_heads=1, activation="gelu_new", learned_positions=True,
        decoder_start_token_id=2, attention_bias=False,
        sparse_impl=sparse_impl,
    )


def _hf_rand_maps(hf_model, seq_len, block_size, num_rand):
    """Extract each encoder layer's random-block plan exactly as HF's
    forward draws it (np.random.seed(layer_seed) + the rand-mask plan
    helpers), as [nb, num_rand] absolute-block maps for our override."""
    nb = seq_len // block_size
    maps = []
    for layer in hf_model.model.encoder.layers:
        attn = layer.self_attn.self
        np.random.seed(attn.seed)
        plan_len, plan_blocks = attn._get_rand_attn_plan(
            seq_len, block_size, num_rand)
        rand_attn = attn._bigbird_block_rand_mask_with_head(
            from_seq_length=seq_len, to_seq_length=seq_len,
            from_block_size=block_size, to_block_size=block_size,
            num_heads=1, plan_from_length=plan_len,
            plan_num_rand_blocks=plan_blocks,
        )
        head0 = np.stack(rand_attn, axis=0)[0]  # [nb-2, num_rand]
        full = np.zeros((nb, num_rand), np.int32)
        full[1:-1] = head0
        maps.append(full)
    return maps


@pytest.mark.parametrize("impl", ["gather", "kernel"])
def test_bigbird_encoder_matches_hf(hf_bigbird, impl):
    """Differential vs HF BigBirdPegasus encoder in block_sparse mode —
    pins our ITC layout (first+last global rows/cols, 3-block band,
    -10000 mask penalty, padded-query zeroing) bit-close to HF's
    `bigbird_block_sparse_attention` (modeling_bigbird_pegasus.py:312).
    Parametrized over the gather formulation AND the fused Pallas kernel
    (impl=kernel — interpret on CPU, Mosaic on TPU)."""
    import torch

    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        convert_hf_seq2seq,
    )

    cfg = _ours_bigbird_cfg(sparse_impl=impl)
    variables = convert_hf_seq2seq(hf_bigbird.state_dict(), cfg)
    model = Seq2Seq(cfg)

    ids, mask = _bigbird_inputs()
    rand_maps = _hf_rand_maps(hf_bigbird, ids.shape[1], cfg.block_size, 1)
    ours = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                       method=model.encode, rand_maps=rand_maps)
    with torch.no_grad():
        theirs = hf_bigbird.model.encoder(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    # padded encoder rows: HF zeroes them inside each sparse-attention
    # call but the residual stream / final LN still carry values there;
    # those positions are masked out of every downstream consumer —
    # compare the valid rows
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(ours)[valid], theirs[valid],
                               rtol=1e-4, atol=1e-4)


def test_bigbird_full_model_logits_match_hf(hf_bigbird):
    """Teacher-forced logits differential for the whole
    BigBirdPegasusForConditionalGeneration (block-sparse encoder + full
    decoder + gelu_new + learned positions + final layernorm_embedding)."""
    import torch

    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        convert_hf_seq2seq,
    )

    cfg = _ours_bigbird_cfg()
    variables = convert_hf_seq2seq(hf_bigbird.state_dict(), cfg)
    model = Seq2Seq(cfg)

    ids, mask = _bigbird_inputs(seed=1)
    rng = np.random.default_rng(2)
    dec = rng.integers(3, 128, size=(2, 6)).astype(np.int32)
    dec[:, 0] = cfg.decoder_start_token_id
    rand_maps = _hf_rand_maps(hf_bigbird, ids.shape[1], cfg.block_size, 1)
    enc = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                      method=model.encode, rand_maps=rand_maps)
    ours = model.apply(variables, jnp.asarray(dec), enc, jnp.asarray(mask),
                       method=model.decode)
    with torch.no_grad():
        theirs = hf_bigbird(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.from_numpy(dec).long(),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)


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


# ---------------------------------------------------------------------------
# fused flash-style Pallas kernel (ops/sparse_attention_pallas.py)
# ---------------------------------------------------------------------------


def test_kernel_matches_gather():
    """The fused kernel (online softmax, scalar-prefetch block DMA) must
    reproduce the XLA gather formulation, including padding and rand
    blocks — interpret mode on CPU, Mosaic on TPU."""
    q, k, v = make_qkv(b=2, l=16 * 8, h=2, hd=16, seed=3)
    mask = np.ones((2, 128), np.int32)
    mask[1, 100:] = 0
    mask = jnp.asarray(mask)
    for rand in (0, 2):
        o_g = block_sparse_attention(q, k, v, mask, block_size=8,
                                     num_rand_blocks=rand, impl="gather")
        o_k = block_sparse_attention(q, k, v, mask, block_size=8,
                                     num_rand_blocks=rand, impl="kernel")
        np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_k),
                                   rtol=2e-5, atol=2e-5)


def test_kernel_matches_gather_rand_map_injection():
    """HF-plan injection (verbatim rand blocks, incl. double counts) must
    flow through the kernel identically."""
    q, k, v = make_qkv(b=1, l=16 * 8, h=1, hd=16, seed=4)
    mask = jnp.ones((1, 128), jnp.int32)
    # adversarial plan: collides with window AND globals (double-count)
    rand_map = np.zeros((16, 2), np.int32)
    for qb in range(16):
        rand_map[qb] = [0, min(qb + 1, 15)]
    kw = dict(block_size=8, num_rand_blocks=2, rand_map=rand_map)
    o_g = block_sparse_attention(q, k, v, mask, impl="gather", **kw)
    o_k = block_sparse_attention(q, k, v, mask, impl="kernel", **kw)
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_k),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_matches_gather_band():
    q, k, v = [x.astype(jnp.bfloat16) for x in
               make_qkv(b=1, l=16 * 8, h=2, hd=16, seed=5)]
    mask = jnp.ones((1, 128), jnp.int32)
    o_g = block_sparse_attention(q, k, v, mask, block_size=8,
                                 num_rand_blocks=1, impl="gather")
    o_k = block_sparse_attention(q, k, v, mask, block_size=8,
                                 num_rand_blocks=1, impl="kernel")
    np.testing.assert_allclose(
        np.asarray(o_g, np.float32), np.asarray(o_k, np.float32),
        rtol=2e-2, atol=2e-2)
