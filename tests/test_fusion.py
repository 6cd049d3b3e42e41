"""Fusion model tests: all head types, batched-window equivalence, and the
stacked-parameter semantics (per-position weights independent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.bert import BertConfig, BertModel
from video_chapter_generation_tpu.models.fusion import (
    ChapterHead,
    StackedDense,
    StackedWindowAttention,
    TwoStream,
    TwoStreamWindow,
    WindowChapterHead,
)
from video_chapter_generation_tpu.models.resnet import ResNet

SEG, H = 4, 16


def tiny_models():
    lang = BertModel(BertConfig.tiny())
    vision = ResNet(stage_sizes=(1, 1, 1, 1), n_segment=SEG)
    return lang, vision


def test_stacked_dense_is_per_position():
    """Each window position must have its own weights: permuting positions
    changes outputs per-position."""
    m = StackedDense(num_stacks=3, features=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    # swap positions 0 and 1 of the input: outputs at 0/1 use different
    # weights, so y_swapped[:,0] != y[:,1] (unlike a shared Dense)
    xs = x[:, [1, 0, 2]]
    ys = m.apply(v, xs)
    assert not np.allclose(np.asarray(ys[:, 0]), np.asarray(y[:, 1]))
    # but position 2 is untouched
    np.testing.assert_allclose(np.asarray(ys[:, 2]), np.asarray(y[:, 2]), rtol=1e-6)


@pytest.mark.parametrize(
    "head_type", ["mlp", "bilinear", "multiplication", "self_attn", "cross_attn"]
)
def test_window_chapter_head_shapes(head_type):
    num_clips = 3
    m = WindowChapterHead(
        num_clips=num_clips, segment_size=SEG, hidden_size=H, head_type=head_type
    )
    lang = jax.random.normal(jax.random.PRNGKey(0), (2, num_clips, 24))
    vision = jax.random.normal(jax.random.PRNGKey(1), (2, num_clips, SEG, 32))
    v = m.init(jax.random.PRNGKey(2), lang, vision)
    out = m.apply(v, lang, vision)
    assert out.shape == (2, num_clips, H)
    assert np.isfinite(np.asarray(out)).all()


def test_stacked_window_attention():
    m = StackedWindowAttention(hidden_size=H, num_heads=4, window_size=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, H))
    v = m.init(jax.random.PRNGKey(1), x)
    logits, probs = m.apply(v, x)
    assert logits.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    # changing a non-middle clip must still influence the logits (attention
    # receptive field); at random init the effect is small, so perturb hard
    x2 = x.at[:, 0].add(100.0)
    logits2, _ = m.apply(v, x2)
    assert float(jnp.abs(logits - logits2).max()) > 1e-5


@pytest.mark.slow
def test_two_stream_base():
    lang, vision = tiny_models()
    m = TwoStream(lang_model=lang, vision_model=vision, segment_size=SEG,
                  hidden_size=H, head_type="mlp")
    img = jnp.zeros((2, SEG, 32, 32, 3))
    ids = jnp.ones((2, 12), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), img, ids, mask)
    logits, prob = m.apply(v, img, ids, mask)
    assert logits.shape == (2, 2)
    # return_emb path (vision-emb dump, two_stream.py:172-194)
    _, _, emb = m.apply(v, img, ids, mask, return_emb=True)
    assert emb.shape == (2, SEG, 2048)


@pytest.mark.slow
def test_two_stream_window_end_to_end():
    lang, vision = tiny_models()
    W = 3
    m = TwoStreamWindow(
        lang_model=lang, vision_model=vision, window_size=1,
        segment_size=SEG, hidden_size=H, head_type="mlp",
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, W, SEG, 32, 32, 3))
    ids = jnp.ones((1, W, 12), jnp.int32)
    mask = jnp.ones((1, W, 12), jnp.int32)
    v = m.init(jax.random.PRNGKey(1), img, ids, mask)
    logits, prob = m.apply(v, img, ids, mask)
    assert logits.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)

    # deterministic=True must be reproducible
    logits2, _ = m.apply(v, img, ids, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)

    # dropout active -> different outputs with different rngs
    d1, _ = m.apply(v, img, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    d2, _ = m.apply(v, img, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(4)})
    assert float(jnp.abs(d1 - d2).max()) > 1e-6
