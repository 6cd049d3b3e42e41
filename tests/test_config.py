import pytest

from video_chapter_generation_tpu.core import Config


def test_defaults_match_reference_contract():
    cfg = Config()
    assert cfg.data.clip_frame_num == 16
    assert cfg.data.max_offset == 2
    assert cfg.data.max_text_len == 100
    assert cfg.data.title_input_len == 512
    assert cfg.data.title_decode_len == 30
    assert cfg.train.seed == 123


def test_overrides():
    cfg = Config().apply_overrides(
        ["data.clip_frame_num=8", "--model.head_type=cross_attn", "optim.betas=[0.9,0.95]"]
    )
    assert cfg.data.clip_frame_num == 8
    assert cfg.model.head_type == "cross_attn"
    assert cfg.optim.betas == (0.9, 0.95)


def test_round_trip():
    cfg = Config().apply_overrides(["train.max_epochs=5"])
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2 == cfg


def test_unknown_field_rejected():
    with pytest.raises(ValueError):
        Config().apply_overrides(["data.nonexistent=1"])
