"""CLI end-to-end smoke tests on a tiny on-disk corpus (CSV + subtitle
JSONs + JPEG frames), exercising the same file contract as the reference."""

import json
import os

import numpy as np
import pytest

from video_chapter_generation_tpu.datasetkit.parsing import TIMESTAMP_DELIMITER


@pytest.fixture(scope="module")
def disk_corpus(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("corpus")
    img_dir = root / "frames"
    cat_dir = root / "howto"
    cat_dir.mkdir()
    vids = ["aaa11111111", "bbb22222222"]
    rows = ["videoId,title,duration,timestamp"]
    rng = np.random.default_rng(0)
    image_num = 60
    for vid in vids:
        ts = TIMESTAMP_DELIMITER.join(["0:00 intro", "0:24 middle part",
                                       "0:48 ending"])
        rows.append(f'{vid},video {vid},{image_num}.0,"{ts}"')
        subs = [{"text": f"word{i} talk", "start": float(i)}
                for i in range(0, image_num, 2)]
        (cat_dir / f"subtitle_{vid}.json").write_text(json.dumps(subs))
        vdir = img_dir / vid
        vdir.mkdir(parents=True)
        for i in range(1, image_num + 4):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(vdir / ("%05d.jpg" % i))
    (root / "all_in_one.csv").write_text("\n".join(rows) + "\n")
    (root / "train.txt").write_text("\n".join(vids) + "\n")
    (root / "val.txt").write_text(vids[0] + "\n")
    (root / "test.txt").write_text(vids[1] + "\n")
    return root


def _common_overrides(root, tmp, extra=()):
    return [
        f'data.img_dir="{root}/frames"',
        f'data.data_file="{root}/all_in_one.csv"',
        f'data.train_vid_file="{root}/train.txt"',
        f'data.val_vid_file="{root}/val.txt"',
        f'data.test_vid_file="{root}/test.txt"',
        f'train.ckpt_dir="{tmp}/ckpt"',
        f'train.log_dir="{tmp}/logs"',
        "data.batch_size=2",
        "data.max_text_len=16",
        "train.max_epochs=1",
        "train.eval_every_epochs=1",
        "optim.gradient_accumulation_steps=1",
        "mesh.data_axis=2",  # tiny batches
        *extra,
    ]


def test_corpus_from_files(disk_corpus):
    from video_chapter_generation_tpu.data.corpus import VideoCorpus

    corpus = VideoCorpus.from_files(
        str(disk_corpus / "frames"), str(disk_corpus / "all_in_one.csv"),
        str(disk_corpus / "train.txt"),
    )
    assert len(corpus) == 2
    assert corpus.image_num(corpus.vids[0]) == 63  # 60 + 3 extra
    assert corpus.raw_cut_secs(corpus.vids[0]) == [0, 24, 48]
    assert len(corpus.subtitles(corpus.vids[0])) == 30


def test_train_segment_text_cli(disk_corpus, tmp_path):
    from video_chapter_generation_tpu.cli import train_segment

    train_segment.main(
        _common_overrides(disk_corpus, tmp_path, ['model.kind="text"'])
        + ["--tiny"]
    )
    assert os.path.isdir(tmp_path / "ckpt")


@pytest.mark.slow
def test_train_segment_window_cli(disk_corpus, tmp_path):
    from video_chapter_generation_tpu.cli import train_segment

    train_segment.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ['model.kind="two_stream_window"', "data.clip_frame_num=8",
             "data.window_size=1"],
        )
        + ["--tiny"]
    )


def test_flatten_eval_infer_cli(disk_corpus, tmp_path, monkeypatch):
    """flatten clips -> eval_segment -> infer_video, chained like the
    reference's offline pipeline."""
    from video_chapter_generation_tpu.cli import eval_segment, infer_video
    from video_chapter_generation_tpu.datasetkit.flatten import main as flatten_main

    clips_json = str(tmp_path / "test_clips.json")
    flatten_main([
        f'--img_dir={disk_corpus}/frames',
        f'--data_file={disk_corpus}/all_in_one.csv',
        f'--vid_file={disk_corpus}/test.txt',
        f'--out={clips_json}',
        '--clip_frame_num=8',
    ])
    data = json.load(open(clips_json))
    assert len(data) > 0 and "image_paths" in data[0]

    monkeypatch.chdir(tmp_path)
    eval_segment.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ['model.kind="text"', f'data.test_clips_json="{clips_json}"',
             "data.clip_frame_num=8"],
        )
        + ["--tiny"]
    )
    assert os.path.exists(tmp_path / "test_results/text_head_mlp.txt")

    infer_video.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ['model.kind="text"', "data.clip_frame_num=8",
             "data.title_input_len=24", "data.title_decode_len=6"],
        )
        + ["--tiny"]
    )


def test_pretrain_contrastive_cli(disk_corpus, tmp_path):
    from video_chapter_generation_tpu.cli import pretrain_contrastive

    pretrain_contrastive.main(
        _common_overrides(disk_corpus, tmp_path,
                          ["data.batch_size=2", "train.max_epochs=1"])
        + ["--tiny"]
    )


def test_train_listwise_cli(disk_corpus, tmp_path):
    from video_chapter_generation_tpu.cli import train_listwise

    train_listwise.main(
        _common_overrides(disk_corpus, tmp_path,
                          ["data.batch_size=2", "train.max_epochs=1",
                           "data.clip_frame_num=8"])
        + ["--tiny"]
    )


def test_vision_title_cli_chain(disk_corpus, tmp_path, monkeypatch):
    """extract_vision_emb -> eval_title --vision_emb_dir -> infer_video
    --vision_emb_dir: the reference's best-ROUGE configuration
    (convert2vision_emb.py -> test_chapter_title_gen_vision_emb.py ->
    whole pipeline) end to end on the disk corpus."""
    from video_chapter_generation_tpu.cli import (
        eval_title,
        extract_vision_emb,
        infer_video,
    )
    from video_chapter_generation_tpu.datasetkit.flatten import (
        main as flatten_main,
    )

    clips_json = str(tmp_path / "test_clips.json")
    flatten_main([
        f'--img_dir={disk_corpus}/frames',
        f'--data_file={disk_corpus}/all_in_one.csv',
        f'--vid_file={disk_corpus}/test.txt',
        f'--out={clips_json}',
        '--clip_frame_num=16',
    ])
    emb_dir = str(tmp_path / "vision_embs")
    extract_vision_emb.main(
        _common_overrides(
            disk_corpus, tmp_path,
            [f'data.test_clips_json="{clips_json}"',
             "data.clip_frame_num=16"],
        )
        + ["--tiny", "--out_dir", emb_dir]
    )
    vid = open(disk_corpus / "test.txt").read().strip()
    assert os.path.exists(os.path.join(emb_dir, vid, "vision_emb_0_16.npy"))
    emb = np.load(os.path.join(emb_dir, vid, "vision_emb_0_16.npy"))
    assert emb.shape == (16, 2048)

    monkeypatch.chdir(tmp_path)
    eval_title.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ["data.title_input_len=24", "data.title_decode_len=6",
             "data.batch_size=2"],
        )
        + ["--tiny", "--vision_emb_dir", emb_dir]
    )
    assert (tmp_path /
            "test_results/chapter_title_gen/vision_gt_batch_2.txt").exists()

    infer_video.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ['model.kind="text"', "data.clip_frame_num=16",
             "data.title_input_len=24", "data.title_decode_len=6"],
        )
        + ["--tiny", "--vision_emb_dir", emb_dir]
    )
    assert (tmp_path / "test_results/whole_pipeline_result.txt").exists()


def test_eval_title_cli(disk_corpus, tmp_path, monkeypatch):
    from video_chapter_generation_tpu.cli import eval_title

    monkeypatch.chdir(tmp_path)
    eval_title.main(
        _common_overrides(
            disk_corpus, tmp_path,
            ["data.title_input_len=24", "data.title_decode_len=6",
             "data.batch_size=2"],
        )
        + ["--tiny"]
    )
    assert (tmp_path / "test_results/chapter_title_gen/gt_batch_2.txt").exists()


def test_title_arch_selection():
    """--title_arch maps to the three reference title families
    (train_chapter_title_gen.py model_type pegasus|bigbird|bart) at both
    sizes; bigbird = block-sparse long-context encoder."""
    from types import SimpleNamespace

    from video_chapter_generation_tpu.cli.common import title_s2s_config

    tok = SimpleNamespace(vocab_size=500)
    for tiny in (True, False):
        peg = title_s2s_config(
            SimpleNamespace(tiny=tiny, title_arch="pegasus"), tok)
        assert peg.encoder_attention == "full" and peg.activation == "relu"
        bb = title_s2s_config(
            SimpleNamespace(tiny=tiny, title_arch="bigbird"), tok)
        assert bb.encoder_attention == "block_sparse"
        assert bb.activation == "gelu_new" and not bb.attention_bias
        assert bb.learned_positions and bb.decoder_start_token_id == 2
        bart = title_s2s_config(
            SimpleNamespace(tiny=tiny, title_arch="bart"), tok)
        assert not bart.pre_norm and bart.embed_layernorm
        assert bart.vocab_size == 500
    full = title_s2s_config(
        SimpleNamespace(tiny=False, title_arch="bigbird"), tok)
    assert full.max_positions == 4096 and full.block_size == 64


def test_eval_title_int8_cli(disk_corpus, tmp_path, monkeypatch):
    """--int8_titles must run the whole eval CLI on the quantized model
    (weight-only int8 + int8 cross-KV) and emit the result file."""
    from video_chapter_generation_tpu.cli import eval_title

    monkeypatch.chdir(tmp_path)
    eval_title.main(
        ["--tiny", "--int8_titles"]
        + _common_overrides(
            disk_corpus, tmp_path,
            ["data.title_input_len=24", "data.title_decode_len=6",
             "data.batch_size=2"],
        )
    )
    assert (tmp_path / "test_results/chapter_title_gen/gt_batch_2.txt").exists()


def test_pretrain_gpt_and_sample_cli(disk_corpus, tmp_path, capsys):
    """pretrain_lang --task next_token_gpt (word-level from-scratch GPT,
    pretrain_lang_model.py use_glove_emb=False) then sample_lang: the
    test_gpt.py:91-108 'generate self-defined sentence' surface."""
    from video_chapter_generation_tpu.cli import pretrain_lang, sample_lang

    overrides = _common_overrides(disk_corpus, tmp_path)
    pretrain_lang.main(["--task", "next_token_gpt"] + overrides + ["--tiny"])
    assert os.path.isdir(tmp_path / "ckpt")

    sample_lang.main(
        ["--task", "next_token_gpt", "--prompt", "talk word2",
         "--num_samples", "2", "--max_new_tokens", "4", "--top_k", "3"]
        + overrides + ["--tiny"]
    )
    out = capsys.readouterr().out
    assert "restored checkpoint" in out
    lines = [l for l in out.splitlines() if l.startswith("talk word2 * ")]
    assert len(lines) == 2
    # completions are 4 in-vocab words each
    for line in lines:
        words = line.split(" * ")[1].split(" ")
        assert len(words) == 4


def test_sample_lang_bert_cli(disk_corpus, tmp_path, capsys):
    """--task next_token samples the BERT next-token head (random weights
    when no checkpoint exists — the smoke contract of the other CLIs)."""
    from video_chapter_generation_tpu.cli import sample_lang

    sample_lang.main(
        ["--task", "next_token", "--prompt", "talk word2", "--greedy",
         "--num_samples", "1", "--max_new_tokens", "3"]
        + _common_overrides(disk_corpus, tmp_path) + ["--tiny"]
    )
    out = capsys.readouterr().out
    assert any(l.startswith("talk word2 * ") for l in out.splitlines())
