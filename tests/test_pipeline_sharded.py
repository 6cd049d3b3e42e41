"""Multi-chip inference on the 8-virtual-device CPU mesh: data-sharded
clip scoring matches the single-device path bit-for-bit, the title wrapper
pads/trims chapter rows, and the video fan-out merges per-process results
(pipeline/sharded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures import make_corpus, make_wordpiece
from video_chapter_generation_tpu.data.clip_grid import flatten_video_to_clips
from video_chapter_generation_tpu.data.datasets import InferClipDataset
from video_chapter_generation_tpu.models.bert import BertConfig, BertForChapter
from video_chapter_generation_tpu.parallel import make_mesh, shard_params_tp
from video_chapter_generation_tpu.pipeline import (
    make_sharded_text_score_fn,
    make_text_score_fn,
    run_videos_distributed,
    score_clips,
    shard_title_fn,
)


@pytest.fixture(scope="module")
def tiny_text_model():
    tok = make_wordpiece()
    model = BertForChapter(BertConfig.tiny(vocab_size=tok.vocab_size),
                           pretrain_stage=False)
    ids = jnp.ones((1, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
    return tok, model, variables


def _dataset(tok, corpus, vid="vid0"):
    clips = flatten_video_to_clips(
        vid, "", corpus.image_num(vid), corpus.raw_cut_secs(vid),
        corpus.subtitles(vid), 16,
    )
    return InferClipDataset(clips, tok, max_text_len=16, mode="text")


def test_sharded_scores_match_single_device(tiny_text_model):
    tok, model, variables = tiny_text_model
    corpus = make_corpus(1)
    mesh = make_mesh(data=4, model=2)

    ref = score_clips(_dataset(tok, corpus),
                      make_text_score_fn(model, variables), batch_size=8)
    with mesh:
        shd = score_clips(_dataset(tok, corpus),
                          make_sharded_text_score_fn(model, variables, mesh),
                          batch_size=8)
    np.testing.assert_allclose(
        [c.pred_score for c in shd], [c.pred_score for c in ref], atol=1e-6
    )
    assert [c.pred_label for c in shd] == [c.pred_label for c in ref]


def test_sharded_batch_divisibility_checked(tiny_text_model):
    tok, model, variables = tiny_text_model
    mesh = make_mesh(data=8, model=1)
    fn = make_sharded_text_score_fn(model, variables, mesh)
    bad = {"text_ids": np.ones((6, 16), np.int32),
           "attention_mask": np.ones((6, 16), np.int32)}
    with pytest.raises(AssertionError, match="not divisible"):
        fn(bad)


def test_shard_title_fn_pads_and_trims():
    mesh = make_mesh(data=8, model=1)
    calls = {}

    def title_fn(ids, mask):
        calls["n"] = int(ids.shape[0])
        # echo back a derived row so trimming is observable
        return np.asarray(ids)[:, :4] + np.asarray(mask)[:, :4]

    wrapped = shard_title_fn(title_fn, mesh)
    ids = np.arange(3 * 8, dtype=np.int32).reshape(3, 8)
    mask = np.ones_like(ids)
    out = wrapped(ids, mask)
    assert calls["n"] == 8  # 3 chapters padded to the data-axis size
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out, ids[:, :4] + 1)


def test_tp_sharded_title_decode_matches_unsharded():
    """TP where it matters in production: a Pegasus-shaped decode with
    FFN/vocab-head weights sharded over 'model' (shard_params_tp) must
    emit exactly the tokens the unsharded decode does — GSPMD collectives
    change layout, not math (PERF.md:682-694; HBM-bound decode is THE
    real TP target at 568M params)."""
    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        Seq2SeqConfig,
        generate,
    )

    cfg = Seq2SeqConfig.tiny()
    model = Seq2Seq(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (4, 12)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    variables = model.init(jax.random.PRNGKey(0), ids, mask, ids[:, :4])

    ref_ids, ref_logits = generate(model, variables, ids, mask, max_len=6)

    mesh = make_mesh(data=4, model=2)
    specs = shard_params_tp(mesh, variables["params"], min_size=64)
    n_tp = sum(1 for s in jax.tree_util.tree_leaves(specs)
               if s.spec != jax.sharding.PartitionSpec())
    assert n_tp > 0, "min_size=64 must shard the FFN/vocab matrices"
    sharded_vars = {
        "params": jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), variables["params"], specs,
            is_leaf=lambda x: hasattr(x, "shape"),
        )
    }
    from video_chapter_generation_tpu.parallel.mesh import batch_sharding

    with mesh:
        ids_s = jax.device_put(ids, batch_sharding(mesh))
        mask_s = jax.device_put(mask, batch_sharding(mesh))
        tp_ids, tp_logits = generate(model, sharded_vars, ids_s, mask_s,
                                     max_len=6)
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(tp_ids))
    np.testing.assert_allclose(np.asarray(ref_logits),
                               np.asarray(tp_logits), rtol=2e-5, atol=2e-5)


def test_shard_params_tp_specs():
    mesh = make_mesh(data=4, model=2)
    tree = {
        "kernel": np.zeros((64, 64), np.float32),   # shard last axis
        "odd": np.zeros((64, 63), np.float32),      # last not divisible
        "bias": np.zeros((64,), np.float32),        # 1-D: replicated
        "small": np.zeros((2, 2), np.float32),      # too small: replicated
    }
    specs = shard_params_tp(mesh, tree, min_size=256)
    assert specs["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert specs["odd"].spec == jax.sharding.PartitionSpec("model", None)
    assert specs["bias"].spec == jax.sharding.PartitionSpec()
    assert specs["small"].spec == jax.sharding.PartitionSpec()


_FANOUT_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from video_chapter_generation_tpu.parallel import dist

rank = int(sys.argv[1])
dist.initialize(coordinator_address={addr!r}, num_processes=2,
                process_id=rank)

import numpy as np
import jax.numpy as jnp
from tests.fixtures import make_corpus, make_wordpiece
from video_chapter_generation_tpu.models.bert import (
    BertConfig, BertForChapter)
from video_chapter_generation_tpu.pipeline import (
    ChapterPipeline, make_text_score_fn, run_videos_distributed)

tok = make_wordpiece()
model = BertForChapter(BertConfig.tiny(vocab_size=tok.vocab_size),
                       pretrain_stage=False)
ids = jnp.ones((1, 16), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
corpus = make_corpus(3)
pipe = ChapterPipeline(
    corpus, tok, make_text_score_fn(model, variables),
    lambda i, m: np.zeros((i.shape[0], 2), np.int32),
    decode_fn=lambda row: "t", score_mode="text",
    max_text_len=16, title_input_len=16, batch_size=8)
out = run_videos_distributed(pipe, pipelined=False)
# every process ends with ALL videos, in corpus order, despite each
# having chapterized only vids[rank::2]
assert list(out) == corpus.vids, list(out)
assert all(len(v.clip_scores) > 0 for v in out.values())
print(f"rank {{rank}} fanout OK {{len(out)}} videos")
"""


@pytest.mark.slow
def test_run_videos_distributed_two_processes():
    """Real 2-process video fan-out: each rank scores its share, merged
    results arrive everywhere via dist.all_gather_object."""
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = _FANOUT_WORKER.format(repo=repo, addr=f"localhost:{port}")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(rank)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} fanout OK 3 videos" in out


def test_run_videos_distributed_single_process(tiny_text_model):
    """world=1 degenerate case: fan-out returns every video, same results
    as pipe.run (the 2-process path is rehearsed in
    test_dist_multiprocess-style subprocesses below)."""
    from video_chapter_generation_tpu.pipeline import ChapterPipeline

    tok, model, variables = tiny_text_model
    corpus = make_corpus(2)
    score_fn = make_text_score_fn(model, variables)

    def title_fn(ids, mask):
        return np.zeros((ids.shape[0], 2), np.int32)

    pipe = ChapterPipeline(corpus, tok, score_fn, title_fn,
                           decode_fn=lambda row: "t", score_mode="text",
                           max_text_len=16, title_input_len=16, batch_size=8)
    out = run_videos_distributed(pipe, pipelined=False)
    assert list(out) == corpus.vids
    ref = pipe.run(corpus.vids)
    for vid in corpus.vids:
        assert out[vid].cut_points == ref[vid].cut_points
