"""Checkpoint-carried config contract (core/contract.py): eval/infer must
hard-fail on train/eval config divergence instead of silently degrading
(the round-4 silent-zero-vision class of bug)."""

import numpy as np
import pytest

from video_chapter_generation_tpu.core.contract import (
    ContractMismatch,
    assert_contract,
    build_contract,
    vocab_hash,
)


def test_build_contract_drops_none_and_unboxes_numpy():
    c = build_contract(a=1, b=None, c=np.int64(7), d="x")
    assert c == {"a": 1, "c": 7, "d": "x"}
    assert type(c["c"]) is int  # JSON-safe


def test_assert_contract_pass_and_fail():
    saved = {"frame_hw": 224, "clip_frame_num": 16, "vocab_hash": "ab"}
    assert_contract(saved, {"frame_hw": 224, "clip_frame_num": 16})
    assert_contract(None, {"frame_hw": 64})      # pre-contract checkpoint
    assert_contract({}, {"frame_hw": 64})
    assert_contract(saved, {"new_key": 1})        # disjoint keys pass
    with pytest.raises(ContractMismatch) as e:
        assert_contract(saved, {"frame_hw": 64, "vocab_hash": "cd"},
                        context="eval_segment")
    msg = str(e.value)
    assert "frame_hw" in msg and "vocab_hash" in msg and "224" in msg


def test_vocab_hash_order_sensitive():
    assert vocab_hash(["a", "b"]) != vocab_hash(["b", "a"])
    assert vocab_hash(["a", "b"]) == vocab_hash(["a", "b"])

    class Tok:
        vocab = {"x": 0, "y": 1}

    class TokRev:
        vocab = {"y": 0, "x": 1}

    assert vocab_hash(Tok()) == vocab_hash(["x", "y"])
    assert vocab_hash(Tok()) != vocab_hash(TokRev())
    assert vocab_hash(object()) is None


def test_tasks_publish_contracts():
    from video_chapter_generation_tpu.core import Config
    from video_chapter_generation_tpu.train.tasks import (
        SegmentTextTask,
        SegmentWindowTask,
    )

    cfg = Config()
    t = SegmentWindowTask(cfg, tiny=True, hw=64)
    assert t.contract["model_kind"] == "two_stream_window"
    assert t.contract["frame_hw"] == 64
    assert t.contract["window_size"] == cfg.data.window_size
    t2 = SegmentTextTask(cfg, tiny=True, vocab_size=77)
    assert t2.contract == {"model_kind": "text",
                           "max_text_len": cfg.data.max_text_len,
                           "vocab_size": 77}
    # contracts are per-instance (no shared class-dict mutation)
    t2.contract = dict(t2.contract, vocab_hash="zz")
    assert "vocab_hash" not in SegmentTextTask(cfg, tiny=True,
                                               vocab_size=77).contract


def test_trainer_persists_contract_and_eval_asserts(tmp_path):
    """Train the text CLI, then eval with a DIVERGED max_text_len: the
    eval CLI must raise ContractMismatch, not emit silently-wrong
    metrics. With the matching config it must pass."""
    import json
    import os

    from PIL import Image

    from video_chapter_generation_tpu.cli import eval_segment, train_segment
    from video_chapter_generation_tpu.datasetkit.flatten import (
        main as flatten_main,
    )
    from video_chapter_generation_tpu.datasetkit.parsing import (
        TIMESTAMP_DELIMITER,
    )

    root = tmp_path / "corpus"
    (root / "howto").mkdir(parents=True)
    vids = ["aaa11111111", "bbb22222222"]
    rows = ["videoId,title,duration,timestamp"]
    rng = np.random.default_rng(0)
    for vid in vids:
        ts = TIMESTAMP_DELIMITER.join(["0:00 intro", "0:24 mid", "0:48 end"])
        rows.append(f'{vid},video {vid},60.0,"{ts}"')
        subs = [{"text": f"word{i} talk", "start": float(i)}
                for i in range(0, 60, 2)]
        (root / "howto" / f"subtitle_{vid}.json").write_text(json.dumps(subs))
        vdir = root / "frames" / vid
        vdir.mkdir(parents=True)
        for i in range(1, 64):
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            ).save(vdir / ("%05d.jpg" % i))
    (root / "all_in_one.csv").write_text("\n".join(rows) + "\n")
    (root / "train.txt").write_text("\n".join(vids) + "\n")
    (root / "val.txt").write_text(vids[0] + "\n")
    (root / "test.txt").write_text(vids[1] + "\n")
    vocab_file = root / "vocab.txt"
    vocab_file.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "talk"]
        + [f"word{i}" for i in range(60)]) + "\n")

    base = [
        f'data.img_dir="{root}/frames"',
        f'data.data_file="{root}/all_in_one.csv"',
        f'data.train_vid_file="{root}/train.txt"',
        f'data.val_vid_file="{root}/val.txt"',
        f'data.test_vid_file="{root}/test.txt"',
        f'train.ckpt_dir="{tmp_path}/ckpt"',
        f'train.log_dir="{tmp_path}/logs"',
        "data.batch_size=2", "train.max_epochs=1",
        "train.eval_every_epochs=1", "optim.gradient_accumulation_steps=1",
        "mesh.data_axis=2", 'model.kind="text"',
    ]
    flags = ["--tiny", "--bert_vocab", str(vocab_file)]
    train_segment.main(base + ["data.max_text_len=16"] + flags)

    clips_json = str(tmp_path / "test_clips.json")
    flatten_main([
        f'--img_dir={root}/frames',
        f'--data_file={root}/all_in_one.csv',
        f'--vid_file={root}/test.txt',
        f'--out={clips_json}', '--clip_frame_num=16',
    ])
    os.chdir(tmp_path)

    eval_args = base + [f'data.test_clips_json="{clips_json}"']
    # diverged max_text_len -> hard fail
    with pytest.raises(ContractMismatch) as e:
        eval_segment.main(eval_args + ["data.max_text_len=12"] + flags)
    assert "max_text_len" in str(e.value)
    # matching config -> runs
    eval_segment.main(eval_args + ["data.max_text_len=16"] + flags)
    assert (tmp_path / "test_results" / "text_head_mlp.txt").exists()
