"""ResNet-50 differential test against torchvision (random weights, CPU)
plus TSM wrapper shape/semantics tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.resnet import (
    ResNet,
    Resnet50TSM,
    convert_hf_resnet,
    convert_torchvision_resnet50,
)


def test_resnet_matches_hf_resnet():
    """Differential test against HuggingFace's ResNet (same v1.5 bottleneck
    architecture as torchvision, random weights, no network)."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.ResNetConfig(
        embedding_size=64,
        hidden_sizes=[256, 512, 1024, 2048],
        depths=[1, 1, 1, 1],
        layer_type="bottleneck",
        downsample_in_first_stage=False,
        downsample_in_bottleneck=False,
    )
    torch.manual_seed(0)
    hf = transformers.ResNetModel(hf_cfg)
    hf.eval()

    variables = convert_hf_resnet(hf.state_dict())
    model = ResNet(stage_sizes=(1, 1, 1, 1))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        theirs = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    pooled = theirs.pooler_output.squeeze(-1).squeeze(-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), pooled, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resnet50_matches_torchvision():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")

    tv = torchvision.models.resnet50(weights=None)
    tv.eval()
    variables = convert_torchvision_resnet50(tv.state_dict())

    model = ResNet(depth=50)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )

    with torch.no_grad():
        theirs = tv.avgpool(
            tv.layer4(tv.layer3(tv.layer2(tv.layer1(
                tv.maxpool(tv.relu(tv.bn1(tv.conv1(
                    torch.from_numpy(x.transpose(0, 3, 1, 2))
                ))))
            ))))
        ).flatten(1).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


def test_resnet_tsm_wrapper_shapes():
    model = Resnet50TSM(segments_size=4, with_head=False)
    x = jnp.zeros((2, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (2, 4, 2048)


def test_resnet_tsm_mixes_time():
    """With TSM, swapping frames at other time steps must change a frame's
    features (temporal receptive field); without TSM it must not."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 4, 32, 32, 3))
    x2 = x.at[:, 3].set(jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)))

    tsm = Resnet50TSM(segments_size=4)
    v = tsm.init(jax.random.PRNGKey(0), x, train=False)
    f1 = tsm.apply(v, x, train=False)
    f2 = tsm.apply(v, x2, train=False)
    # frame 2's features see frame 3 through the left-shift channels
    assert float(jnp.abs(f1[0, 2] - f2[0, 2]).max()) > 1e-6

    plain = ResNet(depth=50)
    pv = plain.init(jax.random.PRNGKey(0), x.reshape(4, 32, 32, 3), train=False)
    g1 = plain.apply(pv, x.reshape(4, 32, 32, 3), train=False)
    g2 = plain.apply(pv, x2.reshape(4, 32, 32, 3), train=False)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]), atol=1e-6)


def test_bn_batch_stats_flag():
    """bn_batch_stats=True at eval reproduces the reference's
    track_running_stats=False hack: output uses batch statistics."""
    model = ResNet(depth=50)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 3 + 1
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    eval_running = model.apply(v, x, train=False)
    # batch-stat eval recomputes stats, so batch_stats must be mutable
    eval_batch, _ = model.apply(
        v, x, train=False, bn_batch_stats=True, mutable=["batch_stats"]
    )
    assert float(jnp.abs(eval_running - eval_batch).max()) > 1e-4
