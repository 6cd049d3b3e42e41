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


def _torchvision_like_resnet(stage_sizes=(1, 1, 1, 1)):
    """A torch ResNet-50-style net with torchvision's exact module NAMING
    and forward (v1.5 bottleneck, stride on conv2) — torchvision itself is
    absent in this environment. State-dict keys match torchvision
    ('conv1.weight', 'layer1.0.conv1.weight', 'layer1.0.downsample.0.*'),
    which is all convert_torchvision_resnet50 consumes."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            for i, n in enumerate(stage_sizes):
                setattr(self, f"layer{i + 1}",
                        self._make_layer(64 * 2**i, n, 1 if i == 0 else 2))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return torch.flatten(self.avgpool(x), 1)

    return ResNet()


@pytest.mark.slow
def test_composed_two_stream_window_matches_reference():
    """End-to-end: a randomly-initialized reference TwoStreamWindow
    (two_stream_window.py:292-445 — the reference's OWN fusion code,
    composed with a real HF torch BERT and a torchvision-naming TSM
    ResNet), full state dict converted via convert_two_stream_window,
    logits compared on random inputs."""
    import torch.nn as nn
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    import model.fusion.two_stream_window as tsw
    from ops.temporal_shift import TemporalShift

    from video_chapter_generation_tpu.models.bert import BertConfig, BertModel
    from video_chapter_generation_tpu.models.convert_reference import (
        convert_two_stream_window,
    )
    from video_chapter_generation_tpu.models.fusion import TwoStreamWindow
    from video_chapter_generation_tpu.models.resnet import ResNet

    SEG_T, HW, L, B = 4, 32, 16, 2
    torch.manual_seed(0)

    class LangWrapper(nn.Module):  # mimics BertHugface's .base_model layout
        def __init__(self):
            super().__init__()
            self.base_model = HFBertModel(HFBertConfig(
                vocab_size=128, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2,
            ))

        def forward(self, **kw):
            return self.base_model(**kw)

    class VisionWrapper(nn.Module):  # mimics Resnet50TSM's .base_model
        def __init__(self):
            super().__init__()
            self.base_model = _torchvision_like_resnet()
            # reference 'blockres' placement (make_temporal_shift
            # needs torchvision; apply its exact per-block rule directly)
            for s in range(1, 5):
                for blk in getattr(self.base_model, f"layer{s}"):
                    blk.conv1 = TemporalShift(blk.conv1, n_segment=SEG_T,
                                              n_div=8)

        def forward(self, x):
            return self.base_model(x)

    ref = tsw.TwoStream(
        lang_model=LangWrapper(), vision_model=VisionWrapper(),
        lang_embed_size=32, vision_embed_size=2048, segment_size=SEG_T,
        hidden_size=H, window_size=1,
    )
    ref.build_chapter_head(output_size=2, head_type="mlp")
    ref.eval()

    rng = np.random.default_rng(2)
    img = rng.standard_normal((B, W, SEG_T, 3, HW, HW)).astype(np.float32)
    ids = rng.integers(0, 128, (B, W, L)).astype(np.int64)
    mask = np.ones((B, W, L), np.int64)

    clip_info = {
        "clip_start_frame": torch.zeros((B, W), dtype=torch.long),
        "total_frames": torch.full((B,), 100, dtype=torch.long),
        "target_clip_idx": torch.ones((B,), dtype=torch.long),
        "total_num_clips": torch.full((B,), 10, dtype=torch.long),
    }
    with torch.no_grad():
        logits_ref, probs_ref = ref(
            torch.from_numpy(img), torch.from_numpy(ids),
            torch.from_numpy(mask), clip_info,
        )

    variables = convert_two_stream_window(ref.state_dict(), window_size=1,
                                          head_type="mlp")
    ours = TwoStreamWindow(
        lang_model=BertModel(BertConfig.tiny(vocab_size=128)),
        vision_model=ResNet(stage_sizes=(1, 1, 1, 1), n_segment=SEG_T),
        window_size=1, segment_size=SEG_T, hidden_size=H, head_type="mlp",
    )
    img_nhwc = np.transpose(img, (0, 1, 2, 4, 5, 3))
    logits_ours, probs_ours = ours.apply(
        variables, jnp.asarray(img_nhwc), jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )

    np.testing.assert_allclose(np.asarray(logits_ours), logits_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs_ours), probs_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


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
