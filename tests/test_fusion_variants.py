"""Domain-specific two-stream + single-block window classifier tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.bert import BertConfig, BertModel
from video_chapter_generation_tpu.models.fusion_variants import (
    DomainSpecificChapterHead,
    DSWindowSelfAttention,
    SingleBlockWindowClassifier,
    TwoStreamDomainSpecific,
)
from video_chapter_generation_tpu.models.resnet import ResNet

SEG, H = 4, 16


def test_ds_window_attention():
    m = DSWindowSelfAttention(H, num_heads=4, window_size=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, H))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 3, H)


def test_domain_specific_head():
    m = DomainSpecificChapterHead(num_clips=3, segment_size=SEG,
                                  hidden_size=H, window_size=1)
    lang = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 24))
    vision = jax.random.normal(jax.random.PRNGKey(1), (2, 3, SEG, 32))
    v = m.init(jax.random.PRNGKey(2), lang, vision)
    logits = m.apply(v, lang, vision)
    assert logits.shape == (2, 2)


def test_two_stream_domain_specific_end_to_end():
    m = TwoStreamDomainSpecific(
        lang_model=BertModel(BertConfig.tiny()),
        vision_model=ResNet(stage_sizes=(1, 1, 1, 1), n_segment=SEG),
        window_size=1, segment_size=SEG, hidden_size=H,
    )
    img = jnp.zeros((1, 3, SEG, 32, 32, 3))
    ids = jnp.ones((1, 3, 12), jnp.int32)
    mask = jnp.ones((1, 3, 12), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), img, ids, mask)
    logits, prob = m.apply(v, img, ids, mask)
    assert logits.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)


def test_single_block_window_classifier():
    m = SingleBlockWindowClassifier(hidden_size=H, num_heads=4, window_size=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, H))
    v = m.init(jax.random.PRNGKey(1), x)
    logits, probs = m.apply(v, x)
    assert logits.shape == (2, 2)
    # non-middle clips influence the target through attention
    logits2, _ = m.apply(v, x.at[:, 0].add(50.0))
    assert float(jnp.abs(logits - logits2).max()) > 1e-6


def test_grouped_optimizer():
    import optax

    from video_chapter_generation_tpu.core.config import OptimConfig
    from video_chapter_generation_tpu.train.optim import make_grouped_optimizer

    params = {
        "lang_model": {"layer": {"kernel": jnp.ones((4, 4))}},
        "head": {"kernel": jnp.ones((4, 2))},
    }
    cfg = OptimConfig(learning_rate=0.1, weight_decay=0.0,
                      gradient_accumulation_steps=1)
    tx = make_grouped_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head update should be ~2x the backbone update (same adam state shape)
    bb = float(jnp.abs(updates["lang_model"]["layer"]["kernel"]).mean())
    hd = float(jnp.abs(updates["head"]["kernel"]).mean())
    assert hd == pytest.approx(2 * bb, rel=1e-5)
