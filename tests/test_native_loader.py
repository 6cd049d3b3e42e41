"""Native C++ loader tests: decode parity vs PIL, missing-file handling,
fused normalize parity."""

import os

import numpy as np
import pytest

from video_chapter_generation_tpu.data.native_loader import (
    NativeLoader,
    install_native_loader,
)

LIB = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libvcg_host.so")
pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="native library not built"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate([(32, 32), (64, 48), (224, 224)]):
        arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        p = d / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_decode_matches_pil_for_exact_size(jpegs):
    from PIL import Image

    loader = NativeLoader(2)
    out = loader.decode_batch([jpegs[2]], hw=224)
    assert out.shape == (1, 224, 224, 3)
    ref = np.asarray(Image.open(jpegs[2]).convert("RGB"))
    # same decoder (libjpeg) under the hood -> exact match at native size
    np.testing.assert_array_equal(out[0], ref)


def test_decode_batch_resizes_and_zero_fills(jpegs):
    loader = NativeLoader(2)
    paths = jpegs + ["/nonexistent/xx.jpg"]
    out = loader.decode_batch(paths, hw=32)
    assert out.shape == (4, 32, 32, 3)
    assert loader.failures == 1
    assert out[3].sum() == 0  # missing file zero-filled
    assert out[0].sum() > 0


def test_normalize_parity(jpegs):
    from video_chapter_generation_tpu.ops.preprocess import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    loader = NativeLoader(1)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    ours = loader.normalize_f32(u8, IMAGENET_MEAN, IMAGENET_STD)
    ref = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_install_native_loader(jpegs):
    from video_chapter_generation_tpu.data import frames

    assert install_native_loader(2)
    try:
        out = frames.load_clip_frames(jpegs, hw=32)
        assert out.shape == (3, 32, 32, 3)
    finally:
        frames.set_native_loader(None)


def test_decode_batch_s2d_matches_numpy_reorder(jpegs):
    from video_chapter_generation_tpu.data.native_loader import (
        space_to_depth4)

    loader = NativeLoader(2)
    ref = space_to_depth4(loader.decode_batch(jpegs, hw=64))
    got = loader.decode_batch_s2d(jpegs, hw=64)
    assert got.shape == (len(jpegs), 16, 16, 48)
    np.testing.assert_array_equal(got, ref)


def test_load_clip_frames_s2d_path(jpegs):
    from video_chapter_generation_tpu.data import frames
    from video_chapter_generation_tpu.data.native_loader import (
        space_to_depth4)

    assert install_native_loader(2)
    try:
        got = frames.load_clip_frames(jpegs, hw=64, s2d=True)
        ref = space_to_depth4(frames.load_clip_frames(jpegs, hw=64))
        np.testing.assert_array_equal(got, ref)
    finally:
        frames.set_native_loader(None)
