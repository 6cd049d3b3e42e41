"""THE parity test: our fusion modules vs the reference's own torch code,
weights converted from randomly-initialized reference modules.

The reference repo is imported read-only (pure-torch fusion modules only —
no pretrained downloads). Dropout is eval-mode / deterministic on both
sides.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/video_chapter_generation")

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.convert_reference import (
    convert_stacked_window_attention,
    convert_window_chapter_head,
)
from video_chapter_generation_tpu.models.fusion import (
    StackedWindowAttention,
    WindowChapterHead,
)

H = 128  # reference hidden size (needs /16 heads)
SEG = 4
W = 3  # num clips (window_size=1)


@pytest.fixture(scope="module")
def ref_modules():
    import model.fusion.stacked_window_self_attention as swsa
    import model.fusion.two_stream_window as tsw

    torch.manual_seed(0)
    head = tsw.ChapterHead(
        lang_emb_size=64, vision_emb_size=96, segment_size=SEG,
        hidden_size=H, window_size=1, output_size=2, head_type="mlp",
    )
    head.eval()

    cfg = type("Config", (), {
        "hidden_size": H, "num_attention_heads": 16,
        "attention_probs_dropout_prob": 0.1, "window_size": 1,
    })
    attn = swsa.StackedVideoChapterAttention(cfg)
    attn.eval()
    return head, attn


def test_window_chapter_head_matches_reference(ref_modules):
    head, _ = ref_modules
    params = convert_window_chapter_head(head.state_dict(), W, "mlp")
    ours = WindowChapterHead(num_clips=W, segment_size=SEG, hidden_size=H,
                             head_type="mlp")

    rng = np.random.default_rng(0)
    lang = rng.standard_normal((2, W, 64)).astype(np.float32)
    vision = rng.standard_normal((2, W, SEG, 96)).astype(np.float32)

    out_ours = ours.apply({"params": params}, jnp.asarray(lang),
                          jnp.asarray(vision))

    with torch.no_grad():
        per_clip = [
            head(
                torch.from_numpy(lang[:, i].copy()),
                torch.from_numpy(np.ascontiguousarray(vision[:, i])),
                window_idx=i,
            )
            for i in range(W)
        ]
        out_ref = torch.stack(per_clip, dim=1).numpy()

    np.testing.assert_allclose(np.asarray(out_ours), out_ref, rtol=1e-4,
                               atol=1e-4)


def test_stacked_window_attention_matches_reference(ref_modules):
    _, attn = ref_modules
    params = convert_stacked_window_attention(attn.state_dict())
    ours = StackedWindowAttention(hidden_size=H, num_heads=16, window_size=1)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, W, H)).astype(np.float32)

    logits_ours, probs_ours = ours.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        logits_ref, probs_ref = attn(torch.from_numpy(x), clip_info=None)

    np.testing.assert_allclose(np.asarray(logits_ours), logits_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs_ours), probs_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
