"""Property-based tests (hypothesis): clip-grid arithmetic and tokenizers
hold their invariants over randomized inputs, not just the golden cases."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from fixtures import make_unigram, make_wordpiece

from video_chapter_generation_tpu.data.clip_grid import (
    build_clip_grid,
    clip_iou_with_cut_point,
    label_clips,
    valid_cut_points,
)
from video_chapter_generation_tpu.data.text_encode import encode_clip_text
from video_chapter_generation_tpu.evalkit.boundary import (
    calculate_pr,
    convert_clip_label2cut_point,
)

WP = make_wordpiece()
UNI = make_unigram()


@settings(max_examples=60, deadline=None)
@given(
    image_num=st.integers(40, 600),
    clip_frame_num=st.sampled_from([8, 16]),
    cuts=st.lists(st.integers(0, 600), min_size=1, max_size=8, unique=True),
)
def test_clip_grid_invariants(image_num, clip_frame_num, cuts):
    max_offset = 2
    cut_points = valid_cut_points(sorted(cuts), image_num)
    grid = build_clip_grid(image_num, clip_frame_num)
    # grid contract: stride 2*max_offset starts, every clip fits
    assert all(s % (2 * max_offset) == 0 for s, _ in grid)
    assert all(0 <= s and e <= image_num and e - s == clip_frame_num
               for s, e in grid)
    labels = label_clips(grid, cut_points, clip_frame_num, max_offset)
    assert len(labels) == len(grid)
    thresh = (clip_frame_num - max_offset) / (clip_frame_num + max_offset)
    half = clip_frame_num // 2
    for (s0, e0), lab in zip(grid, labels):
        best = max(
            (clip_iou_with_cut_point(s0, e0, c, half) for c in cut_points),
            default=-1.0,
        )
        # labeling rule: positive iff some cut point reaches the IoU
        # threshold (youtube_dataset.py:101-119)
        assert (lab == 1) == (best >= thresh), (s0, best, thresh, lab)


@settings(max_examples=60, deadline=None)
@given(
    image_num=st.integers(80, 600),
    n_cuts=st.integers(1, 5),
    data=st.data(),
)
def test_cut_point_roundtrip_within_tolerance(image_num, n_cuts, data):
    """GT labels -> cut points recovers every well-separated GT cut point
    within the +-5 s tolerance band (recall@5 == 1)."""
    clip_frame_num, max_offset = 16, 2
    lo, hi = clip_frame_num, image_num - clip_frame_num
    if hi - lo < n_cuts * 40:
        return
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(lo // 4, hi // 4).map(lambda x: x * 4),
                min_size=n_cuts, max_size=n_cuts, unique=True,
            )
        )
    )
    # enforce separation so positive runs don't merge
    if any(b - a < 40 for a, b in zip(cuts, cuts[1:])):
        return
    grid = build_clip_grid(image_num, clip_frame_num)
    if not grid:
        return
    labels = list(label_clips(grid, cuts, clip_frame_num, max_offset))
    recovered = convert_clip_label2cut_point(labels, clip_frame_num,
                                             max_offset)
    if not recovered:
        return
    recall5 = calculate_pr(cuts, recovered)[2]
    assert recall5 == 1.0, (cuts, recovered)


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdefghij", min_size=1, max_size=8),
        min_size=0, max_size=30,
    ),
    max_len=st.sampled_from([4, 16, 33]),
)
@pytest.mark.parametrize("tok", [WP, UNI], ids=["wordpiece", "unigram"])
def test_tokenizer_encode_invariants(tok, words, max_len):
    text = " ".join(words)
    ids, mask = encode_clip_text(text, tok, max_len)
    assert ids.shape == (max_len,) and mask.shape == (max_len,)
    assert mask.dtype.kind in "iu" and set(np.unique(mask)) <= {0, 1}
    # mask is a prefix: no real token after the first pad
    if mask.min() == 0:
        first_pad = int(np.argmin(mask))
        assert mask[first_pad:].sum() == 0
    assert ids.min() >= 0 and ids.max() < tok.vocab_size
    # deterministic
    ids2, mask2 = encode_clip_text(text, tok, max_len)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(mask, mask2)


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.sampled_from("intro setup board game rules strategy".split()),
        min_size=1, max_size=12,
    ),
)
def test_tokenizer_decode_roundtrip_known_words(words):
    """In-vocab text round-trips through encode/decode up to whitespace."""
    text = " ".join(words)
    for tok in (WP, UNI):
        ids = tok.convert_tokens_to_ids(tok.tokenize(text))
        decoded = tok.decode(ids)
        assert decoded.split() == text.split(), (tok, decoded, text)
