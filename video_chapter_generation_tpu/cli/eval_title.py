"""Evaluate the chapter-title generator: teacher-forced loss/accuracy,
KV-cached generation, ROUGE-1/2/L vs GT with lead/random/principal
baselines, reference-format result file.

Replaces test_chapter_title_gen.py AND test_chapter_title_gen_vision_emb.py:
`--location gt` uses GT chapters; `--location pred --cut_points
vid2cut_points.json` evaluates on predicted chapters (the end-to-end
setting, test_chapter_title_gen.py:51-95); `--vision_emb_dir DIR` switches
to the vision-conditioned model (Seq2SeqVisionEmb) fed by the
extract_vision_emb dump, fusing per-16s-block embeddings into the encoder
states before the same KV-cached decode
(test_chapter_title_gen_vision_emb.py:1-298).

    python -m video_chapter_generation_tpu.cli.eval_title \
        data.data_file=... data.test_vid_file=... --spm_tsv pieces.tsv \
        [--vision_emb_dir vision_embs] [--fusion_type cross_attn] \
        [--num_beams 4]
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data.datasets import (
        AllChapterTitleDataset,
        AllChapterTitleVisionEmbDataset,
        npy_vision_emb_provider,
    )
    from ..data.loader import DataLoader
    from ..evalkit.title_eval import evaluate_titles, write_title_result_file
    from ..models.seq2seq import (
        Seq2Seq,
        beam_search,
        generate,
        trim_at_eos,
    )
    from ..train.objectives import seq2seq_title_loss
    from ..train.tasks import TitleGenTask, TitleGenVisionTask
    from .common import load_corpus, load_title_tokenizer, parse_config

    argv = list(argv if argv is not None else sys.argv[1:])
    location, cut_points_file = "gt", None
    vision_emb_dir, fusion_type = None, "cross_attn"
    if "--location" in argv:
        i = argv.index("--location")
        location = argv[i + 1]
        del argv[i : i + 2]
    if "--cut_points" in argv:
        i = argv.index("--cut_points")
        cut_points_file = argv[i + 1]
        del argv[i : i + 2]
    if "--vision_emb_dir" in argv:
        i = argv.index("--vision_emb_dir")
        vision_emb_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--fusion_type" in argv:
        i = argv.index("--fusion_type")
        fusion_type = argv[i + 1]
        del argv[i : i + 2]
    num_beams = 1
    if "--num_beams" in argv:
        i = argv.index("--num_beams")
        num_beams = int(argv[i + 1])
        del argv[i : i + 2]
    # --int8_titles: int8 serving of the title model (weight-only int8
    # kernels + int8 cross-KV cache; 1.32x decode, PERF.md round 3) —
    # here so task-metric A/Bs vs bf16 run through the REAL eval CLI
    # (tools/impl_ab_eval.py)
    int8_titles = "--int8_titles" in argv
    if int8_titles:
        argv.remove("--int8_titles")

    cfg, args = parse_config(argv, "evaluate chapter-title generator")
    corpus = load_corpus(cfg, "test")
    tokenizer = load_title_tokenizer(args, corpus)

    vid2cut_points = None
    if location == "pred":
        with open(cut_points_file) as f:
            raw = json.load(f)
        vid2cut_points = {
            vid: d["second_pred_cut_points"] for vid, d in raw.items()
        }

    from .common import title_s2s_config

    s2s_cfg = title_s2s_config(args, tokenizer)
    # even the tiny ResNet variant emits 2048-dim features (64*2^3*4)
    emb_dim = 2048
    if vision_emb_dir is not None:
        ds = AllChapterTitleVisionEmbDataset(
            corpus, tokenizer, npy_vision_emb_provider(vision_emb_dir),
            emb_dim=emb_dim,
            max_text_len=cfg.data.title_input_len,
            chapter_title_text_len=cfg.data.title_decode_len,
            vid2cut_points=vid2cut_points,
        )
        task = TitleGenVisionTask(cfg, s2s_cfg, fusion_type=fusion_type,
                                  vision_emb_size=emb_dim)
    else:
        ds = AllChapterTitleDataset(
            corpus, tokenizer, cfg.data.title_input_len,
            cfg.data.title_decode_len, vid2cut_points=vid2cut_points,
        )
        task = TitleGenTask(cfg, s2s_cfg)
    loader = DataLoader(ds, cfg.data.batch_size, shuffle=False,
                        drop_last=False)

    from ..core.contract import vocab_hash

    task.contract = dict(task.contract, vocab_hash=vocab_hash(tokenizer))
    variables = _restore(cfg, task)
    if int8_titles:
        import dataclasses

        from ..ops.quantize import quantize_seq2seq

        assert vision_emb_dir is None, (
            "--int8_titles supports the text-only title model")
        variables = jax.jit(quantize_seq2seq)(variables)
        s2s_cfg = dataclasses.replace(s2s_cfg, weight_quant=True,
                                      kv_quant=True)
        task.model = task.model.clone(cfg=s2s_cfg)
    inner = Seq2Seq(s2s_cfg)  # decode-side module for the vision wrapper

    @jax.jit
    def forward_metrics(v, batch):
        if vision_emb_dir is not None:
            logits = task.model.apply(
                v, batch["vision_embs"], batch["vision_attention_mask"],
                batch["text_ids"], batch["attention_mask"],
                batch["input_decode_ids"], batch["decode_attention_mask"],
            )
        else:
            logits = task.model.apply(
                v, batch["text_ids"], batch["attention_mask"],
                batch["input_decode_ids"], batch["decode_attention_mask"],
            )
        _, m = seq2seq_title_loss(
            logits, batch["target_decode_ids"],
            batch["decode_attention_mask"],
        )
        return m

    @jax.jit
    def gen(v, batch):
        decode = (
            functools.partial(beam_search, num_beams=num_beams)
            if num_beams > 1 else generate
        )
        if vision_emb_dir is not None:
            # fused encode once, then the SAME KV-cached decode loop on the
            # inner Seq2Seq via enc_hidden_override
            enc = task.model.apply(
                v, batch["vision_embs"], batch["vision_attention_mask"],
                batch["text_ids"], batch["attention_mask"],
                method=task.model.encode_fused,
            )
            out, _ = decode(
                inner, {"params": v["params"]["seq2seq"]},
                batch["text_ids"], batch["attention_mask"],
                max_len=cfg.data.title_decode_len, enc_hidden_override=enc,
            )
        else:
            out, _ = decode(task.model, v, batch["text_ids"],
                            batch["attention_mask"],
                            max_len=cfg.data.title_decode_len)
        return out

    losses, accs = [], []
    gen_texts, gt_texts, source_texts = [], [], []
    for batch in loader(0):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        m = forward_metrics(variables, jb)
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
        gen_ids = gen(variables, jb)
        for row, tgt, src, dmask in zip(
            trim_at_eos(gen_ids, s2s_cfg.eos_token_id),
            np.asarray(batch["target_decode_ids"]),
            np.asarray(batch["text_ids"]),
            np.asarray(batch["decode_attention_mask"]),
        ):
            gen_texts.append(tokenizer.decode(row))
            gt_texts.append(
                tokenizer.decode(list(tgt[: int(dmask.sum())]))
            )
            source_texts.append(tokenizer.decode(list(src)))

    result = evaluate_titles(
        gen_texts, gt_texts, source_texts,
        test_loss=float(np.mean(losses)), test_acc=float(np.mean(accs)),
        seed=cfg.train.seed,
    )
    tag = "vision_" if vision_emb_dir is not None else ""
    out_file = (
        f"test_results/chapter_title_gen/{tag}{location}_batch_"
        f"{cfg.data.batch_size}.txt"
    )
    write_title_result_file(result, out_file)
    print("test_loss", result["test_loss"], "test_acc", result["test_acc"])
    for k in ("generated", "lead", "random", "principal"):
        print(k, "rouge-1 f", result[k]["rouge-1"]["f"])


def _restore(cfg, task):
    import jax

    from ..core.checkpoint import CheckpointManager
    from ..train.loop import create_train_state
    from ..train.optim import make_optimizer

    variables = task.init_variables()
    try:
        ckpt = CheckpointManager(cfg.train.ckpt_dir)
        tx = make_optimizer(cfg.optim, variables["params"])
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            create_train_state(variables, tx),
        )
        restored = ckpt.restore_best(abstract) or ckpt.restore_latest(abstract)
        if restored is not None:
            step, state = restored
            saved_contract = ckpt.metrics_for(step).get("contract")
            variables = {"params": state.params}
            print(f"restored checkpoint at step {int(state.step)}")
        ckpt.close()
    except Exception as e:  # no checkpoint: random weights (smoke/CI)
        print(f"no checkpoint restored ({e})")
        return variables
    if restored is not None:
        # hard-fail on train/eval config divergence — NOT inside the
        # try: a contract mismatch must never degrade to random weights
        from ..core.contract import assert_contract

        assert_contract(saved_contract, getattr(task, "contract", {}),
                        context="checkpoint load")
    return variables


if __name__ == "__main__":
    main()
