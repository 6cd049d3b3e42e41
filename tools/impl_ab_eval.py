"""Task-metric A/B of implementation paths, through the REAL CLIs.

The framework has multiple training impls (tap3 3-tap conv vs the fused
Pallas TRUNK custom VJP) and serving impls (f32 / bf16 / fused Pallas /
int8). Their equivalence evidence was unit-level (bit-pins, cosine
bands) — this harness closes the loop at the TASK-METRIC level the
reference itself reports (test_video_segment_point.py:228-391 mAP/P/R/F,
test_chapter_title_gen.py:200-296 ROUGE/token-acc):

1. builds a LEARNABLE synthetic corpus (data/synth.py learnable=True:
   per-chapter frame styles, boundary-marker subtitles, extractable
   titles) with train/val/test splits;
2. trains the segment model once per training impl (same seed) via
   cli.train_segment, evaluates each through cli.eval_segment on
   flattened clips -> mAP/F1@3s per impl;
3. serving A/B on one checkpoint: bf16 vs --int8_vision (TPU; the int8
   trunk kernels) through the same eval CLI;
4. trains a title model via cli.train_title, evaluates via
   cli.eval_title bf16 vs --int8_titles -> ROUGE-1/token-acc deltas.

CPU (default): tap3-vs-xla training pair + f32-vs-bf16 serving +
int8-titles; tiny models, 64px frames. TPU (--tpu): tap3-vs-auto(trunk)
training pair + bf16-vs-int8_vision serving on the real ResNet50+BERT
two-stream at 224px.

The pytest entry (tests/test_impl_ab.py, marked slow) runs the CPU
matrix with asserted thresholds; PARITY.md records the measured tables.

Usage:
  python tools/impl_ab_eval.py --root /tmp/ab_corpus [--tpu] \
      [--stages corpus,segment,serve,title]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_segment_result(path: str) -> dict:
    """Parse the reference-format segment result txt
    (evalkit/segment_eval.py write_segment_result_files)."""
    txt = open(path).read()
    out = {}
    out["mAP"] = float(re.search(r"mAP ([\d.e+-]+)", txt).group(1))
    for name, key in (("recall@3", "recall_3"), ("precision@3",
                                                 "precision_3"),
                      ("f-score@3", "f1_3"), ("f-score@5", "f1_5")):
        m = re.search(re.escape(name) + r" ([\d.e+-]+)", txt)
        out[key] = float(m.group(1))
    return out


def parse_title_result(path: str) -> dict:
    """Parse the reference-format title result txt
    (evalkit/title_eval.py write_title_result_file)."""
    txt = open(path).read()
    out = {}
    out["test_loss"] = float(
        re.search(r"test_loss ([\d.e+-]+)", txt).group(1))
    out["test_acc"] = float(
        re.search(r"test_acc ([\d.e+-]+)", txt).group(1))
    for k in ("rouge-1", "rouge-2", "rouge-l"):
        out[k] = float(
            re.search(re.escape(k) + r" f ([\d.e+-]+)", txt).group(1))
    return out


def build_corpus(root: str, tpu: bool, n_train=16, n_val=2, n_test=6,
                 video_sec=120, n_chapters=5, seed=7):
    from video_chapter_generation_tpu.data.corpus import VideoCorpus
    from video_chapter_generation_tpu.data.synth import (
        make_synth_corpus_on_disk,
    )
    from video_chapter_generation_tpu.data.tokenization import (
        UnigramTokenizer,
        WordPieceTokenizer,
    )

    hw = 224 if tpu else 64
    paths = make_synth_corpus_on_disk(
        root, n_videos=n_train + n_val + n_test, video_sec=video_sec,
        n_chapters=n_chapters, hw=hw, seed=seed, learnable=True,
        splits={"train": n_train, "val": n_val, "test": n_test},
    )
    # ONE tokenizer pair shared by train and eval (the corpus-built
    # fallback would differ per split — the trained embedding table is
    # tied to the train-time vocab)
    vocab_path = os.path.join(root, "vocab.txt")
    tsv_path = os.path.join(root, "pieces.tsv")
    if not (os.path.exists(vocab_path) and os.path.exists(tsv_path)):
        corpus = VideoCorpus.from_files(
            paths["img_dir"], paths["data_file"], paths["train_vid_file"],
            paths["subtitle_dir"])
        texts = [s["text"] for vid in corpus.vids
                 for s in corpus.subtitles(vid)]
        wp = WordPieceTokenizer.build_from_corpus(texts, vocab_size=2000)
        toks = sorted(wp.vocab, key=wp.vocab.get)
        with open(vocab_path, "w") as f:
            f.write("\n".join(toks) + "\n")
        ug = UnigramTokenizer.build_from_corpus(texts, vocab_size=2000)
        with open(tsv_path, "w") as f:
            for piece, score in ug.pieces.items():
                f.write(f"{piece}\t{score}\n")
    paths = dict(paths, vocab=vocab_path, tsv=tsv_path)
    return paths, hw


def common_overrides(paths, workdir, hw, *, clip_frames, text_len,
                     batch, epochs, seed, ckpt_dir, extra=()):
    return [
        f'data.img_dir="{paths["img_dir"]}"',
        f'data.data_file="{paths["data_file"]}"',
        f'data.train_vid_file="{paths["train_vid_file"]}"',
        f'data.val_vid_file="{paths["val_vid_file"]}"',
        f'data.test_vid_file="{paths["test_vid_file"]}"',
        f'train.ckpt_dir="{ckpt_dir}"',
        f'train.log_dir="{workdir}/logs"',
        "train.tensorboard=false",
        f"data.batch_size={batch}",
        f"data.max_text_len={text_len}",
        f"data.clip_frame_num={clip_frames}",
        f"train.max_epochs={epochs}",
        f"train.eval_every_epochs={max(1, epochs // 3)}",
        f"train.save_every_epochs={max(1, epochs // 4)}",
        f"train.seed={seed}",
        "optim.gradient_accumulation_steps=1",
        f"optim.final_epochs={epochs}",
        "mesh.data_axis=1",
        *extra,
    ]


def flatten_clips(paths, workdir, clip_frames):
    from video_chapter_generation_tpu.datasetkit.flatten import (
        main as flatten_main,
    )

    clips_json = os.path.join(workdir, "test_clips.json")
    if not os.path.exists(clips_json):
        flatten_main([
            f"--img_dir={paths['img_dir']}",
            f"--data_file={paths['data_file']}",
            f"--vid_file={paths['test_vid_file']}",
            f"--out={clips_json}",
            f"--clip_frame_num={clip_frames}",
        ])
    return clips_json


def run_segment_ab(paths, workdir, hw, tpu, impls, seed=123,
                   serve_modes=(), quick=False, epochs=None,
                   kind="two_stream", window_size=1, lr=None,
                   init_streams=None):
    """Train per impl (same seed), eval each through cli.eval_segment.
    serve_modes: extra (tag, flags, overrides) evals on the FIRST impl's
    checkpoint. kind: two_stream (base) or two_stream_window (the
    flagship; heavier — W=2*window_size+1 clips per sample).
    init_streams: checkpoint dir to warm-start the lang/vision streams
    from (the reference's pretrained-stream recipe for the window
    model, train_video_segment_ddp.py:448-464)."""
    from video_chapter_generation_tpu.cli import eval_segment, train_segment

    tiny = not tpu
    clip_frames = 8 if tiny else 16
    # the clip text window is ~10 s of subtitles + injected markers; 24
    # tokens truncates BEFORE the mid-clip boundary marker — the signal
    # the corpus plants (text_len 48 keeps it; TPU runs use the
    # reference's 100)
    text_len = 48 if tiny else 100
    batch = 4 if tiny else 8
    if epochs is None:
        epochs = 150 if tiny else 120
    if quick:
        epochs = 3
    if lr is None:
        lr = "3e-4" if tiny else "1e-4"
    results = {}
    clips_json = flatten_clips(paths, workdir, clip_frames)
    old_cwd = os.getcwd()
    for impl in impls:
        ckpt = os.path.join(workdir, f"ckpt_seg_{kind}_{impl}")
        ov = common_overrides(
            paths, workdir, hw, clip_frames=clip_frames, text_len=text_len,
            batch=batch, epochs=epochs, seed=seed, ckpt_dir=ckpt,
            extra=[f'model.kind="{kind}"', f'model.tsm_impl="{impl}"',
                   f"optim.learning_rate={lr}",
                   f"data.window_size={window_size}",
                   f'model.compute_dtype="bfloat16"'],
        )
        tok = ["--bert_vocab", paths["vocab"]]
        args = tok + ([] if tpu else ["--tiny"]) + ov
        train_args = args + (
            ["--init_streams", init_streams] if init_streams else [])
        print(f"\n=== train segment impl={impl} ===", flush=True)
        train_segment.main(train_args)

        out_dir = os.path.join(workdir, f"eval_seg_{kind}_{impl}")
        os.makedirs(out_dir, exist_ok=True)
        os.chdir(out_dir)
        try:
            eval_segment.main(
                tok + ([] if tpu else ["--tiny"]) + ov
                + [f'data.test_clips_json="{clips_json}"'])
        finally:
            os.chdir(old_cwd)
        results[f"train:{kind}:{impl}"] = parse_segment_result(
            os.path.join(out_dir, f"test_results/{kind}_head_mlp.txt"))

    # serving A/Bs on the first impl's checkpoint
    base_ckpt = os.path.join(workdir, f"ckpt_seg_{kind}_{impls[0]}")
    for tag, flags, extra_ov in serve_modes:
        ov = common_overrides(
            paths, workdir, hw, clip_frames=clip_frames, text_len=text_len,
            batch=batch, epochs=epochs, seed=seed, ckpt_dir=base_ckpt,
            extra=[f'model.kind="{kind}"',
                   f'model.tsm_impl="{impls[0]}"',
                   f"data.window_size={window_size}", *extra_ov],
        )
        out_dir = os.path.join(workdir, f"eval_seg_serve_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        os.chdir(out_dir)
        try:
            eval_segment.main(
                ["--bert_vocab", paths["vocab"], *flags]
                + ([] if tpu else ["--tiny"]) + ov
                + [f'data.test_clips_json="{clips_json}"'])
        finally:
            os.chdir(old_cwd)
        results[f"serve:{tag}"] = parse_segment_result(
            os.path.join(out_dir, f"test_results/{kind}_head_mlp.txt"))
    return results


def run_title_ab(paths, workdir, hw, tpu, seed=123, int8=True,
                 quick=False, epochs=None):
    from video_chapter_generation_tpu.cli import eval_title, train_title

    tiny = not tpu
    in_len = 64 if tiny else 256
    dec_len = 8 if tiny else 12
    batch = 8
    if epochs is None:
        epochs = 400 if tiny else 60
    if quick:
        epochs = 3
    ckpt = os.path.join(workdir, "ckpt_title")
    ov = common_overrides(
        paths, workdir, hw, clip_frames=8, text_len=24, batch=batch,
        epochs=epochs, seed=seed, ckpt_dir=ckpt,
        extra=[f"data.title_input_len={in_len}",
               f"data.title_decode_len={dec_len}",
               f"optim.learning_rate={'1e-3' if tiny else '3e-4'}"],
    )
    args = ["--spm_tsv", paths["tsv"]] + (["--tiny"] if tiny else []) + ov
    print("\n=== train title ===", flush=True)
    train_title.main(args)

    results = {}
    old_cwd = os.getcwd()
    modes = [("bf16", [])] + ([("int8", ["--int8_titles"])] if int8 else [])
    for tag, flags in modes:
        out_dir = os.path.join(workdir, f"eval_title_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        os.chdir(out_dir)
        try:
            eval_title.main(flags + args)
        finally:
            os.chdir(old_cwd)
        results[f"title:{tag}"] = parse_title_result(os.path.join(
            out_dir,
            f"test_results/chapter_title_gen/gt_batch_{batch}.txt"))
    return results


def print_table(results: dict):
    keys = sorted({k for r in results.values() for k in r})
    print("\n| config | " + " | ".join(keys) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for name, r in results.items():
        print(f"| {name} | " +
              " | ".join(f"{r.get(k, float('nan')):.4f}" for k in keys) +
              " |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ab_corpus")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="real-model matrix on TPU (tap3 vs fused trunk "
                    "training; bf16 vs int8 vision serving)")
    ap.add_argument("--stages", default="corpus,segment,serve,title")
    ap.add_argument("--out_json", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="plumbing smoke: 3 epochs per run")
    ap.add_argument("--kind", default="two_stream",
                    choices=("two_stream", "two_stream_window"),
                    help="segment model for the matrix; two_stream_window "
                    "= the FLAGSHIP (reference best-val model, "
                    "two_stream_window.py:292-445)")
    ap.add_argument("--window_size", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", default=None)
    ap.add_argument("--n_train", type=int, default=16,
                    help="train videos in the synthetic corpus (more = "
                    "more steps/epoch; the deep window head needs ~10x "
                    "the base model's steps)")
    ap.add_argument("--impls", default=None,
                    help="comma list of training impls (default: "
                    "tap3,auto on TPU / tap3,xla on CPU)")
    ap.add_argument("--init_streams", default=None,
                    help="checkpoint dir to warm-start lang/vision "
                    "streams from (reference pretrained-stream recipe "
                    "for the window model)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    stages = args.stages.split(",")
    workdir = args.workdir or os.path.join(args.root, "work")
    os.makedirs(workdir, exist_ok=True)
    paths, hw = build_corpus(args.root, args.tpu, n_train=args.n_train)

    results = {}
    if "segment" in stages or "serve" in stages:
        impls = (args.impls.split(",") if args.impls
                 else ["tap3", "auto"] if args.tpu else ["tap3", "xla"])
        serve = []
        if "serve" in stages:
            serve = ([("int8_vision", ["--int8_vision"], []),
                      ] if args.tpu else
                     [("f32", [], ['model.compute_dtype="float32"'])])
        results.update(run_segment_ab(paths, workdir, hw, args.tpu,
                                      impls, serve_modes=serve,
                                      quick=args.quick, kind=args.kind,
                                      window_size=args.window_size,
                                      epochs=args.epochs, lr=args.lr,
                                      init_streams=args.init_streams))
    if "title" in stages:
        results.update(run_title_ab(paths, workdir, hw, args.tpu,
                                    quick=args.quick))

    print_table(results)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"\nwrote {args.out_json}")


if __name__ == "__main__":
    main()
