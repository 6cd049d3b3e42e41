import jax.numpy as jnp
import numpy as np

from video_chapter_generation_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_frames,
    normalize_frames_pallas,
    resize_frames,
)


def torchvision_reference(u8):
    x = u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def test_normalize_matches_torchvision_semantics():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    ours = np.asarray(normalize_frames(jnp.asarray(u8)))
    np.testing.assert_allclose(ours, torchvision_reference(u8), rtol=1e-5, atol=1e-5)


def test_normalize_pallas_matches():
    rng = np.random.default_rng(1)
    # 8x8x3*2 = 384 exactly -> pallas path taken
    u8 = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    a = np.asarray(normalize_frames(jnp.asarray(u8)))
    b = np.asarray(normalize_frames_pallas(jnp.asarray(u8)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_normalize_pallas_fallback_odd_shape():
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8)  # 75 not /384
    b = np.asarray(normalize_frames_pallas(jnp.asarray(u8)))
    np.testing.assert_allclose(b, torchvision_reference(u8), rtol=1e-5, atol=1e-5)


def test_resize():
    x = jnp.ones((2, 4, 4, 3))
    out = resize_frames(x, 8, 8)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
