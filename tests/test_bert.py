"""BERT differential test against HuggingFace transformers (tiny random
config, no network) + chapter/MLM head contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.bert import (
    BertConfig,
    BertForChapter,
    BertModel,
    convert_hf_bert,
)


@pytest.fixture(scope="module")
def hf_pair():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval()
    return hf


def test_bert_matches_hf(hf_pair):
    import torch

    hf = hf_pair
    cfg = BertConfig.tiny(vocab_size=128)
    variables = convert_hf_bert(hf.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 6:] = 0

    model = BertModel(cfg)
    hidden, pooled = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), deterministic=True
    )

    with torch.no_grad():
        out = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))

    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), rtol=1e-4, atol=1e-4
    )


def test_chapter_head_shapes():
    cfg = BertConfig.tiny()
    model = BertForChapter(cfg, pretrain_stage=False)
    ids = jnp.zeros((3, 8), jnp.int32)
    mask = jnp.ones((3, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), ids, mask)
    logits, prob = model.apply(v, ids, mask)
    assert logits.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)


def test_mlm_head_shapes():
    cfg = BertConfig.tiny()
    model = BertForChapter(cfg, pretrain_stage=True)
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), ids, mask)
    logits, _ = model.apply(v, ids, mask)
    assert logits.shape == (2, 8, cfg.vocab_size)
    # bias-free head (reference bert_hugface.py:29-31)
    assert "bias" not in v["params"]["head"]
