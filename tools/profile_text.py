"""Per-HLO device-time profile of the TEXT hot paths on real TPU.

Targets the two text-model stages of the serving pipeline that
bench_pipeline.py exercises (reference surfaces:
test_whole_pipeline_per_video.py boundary scoring + title decode):

  --what decode  : Pegasus-large KV-cached greedy decode (generate),
                   batch 8 chapters, encoder 512 tokens, 30 new tokens —
                   the title stage.
  --what encode  : Pegasus-large encoder alone (512 tokens).
  --what bert    : BERT-base forward (batch 16, 100 tokens) — the text
                   half of boundary scoring.

Reuses the trace capture/summarize machinery of profile_model.py (the
only trustworthy timing through the axon tunnel).

Usage: python tools/profile_text.py --what decode [--b 8] [--top 30]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_model import capture, load_device_events, summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="decode",
                    choices=["decode", "encode", "bert"])
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--enc_len", type=int, default=512)
    ap.add_argument("--out_len", type=int, default=30)
    ap.add_argument("--text_len", type=int, default=100)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 decode weights (quantize_seq2seq)")
    ap.add_argument("--bf16params", action="store_true",
                    help="cast f32 param storage to bf16 (cast_serving_params)")
    ap.add_argument("--kvint8", action="store_true",
                    help="int8 cross-attention KV cache (cfg.kv_quant)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    if args.what == "bert":
        from video_chapter_generation_tpu.models.bert import (
            BertConfig, BertModel,
        )
        model = BertModel(BertConfig())
        ids = jnp.asarray(rng.integers(0, 30000, (args.b, args.text_len)),
                          dtype=jnp.int32)
        mask = jnp.ones_like(ids)
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), ids, mask))()

        @jax.jit
        def fn(v, ids, mask):
            _, pooled = model.apply(v, ids, mask)
            return pooled.astype(jnp.float32)

        fargs = (variables, ids, mask)
    else:
        from video_chapter_generation_tpu.models.seq2seq import (
            Seq2Seq, Seq2SeqConfig, generate,
        )
        import dataclasses

        cfg = Seq2SeqConfig.pegasus_large()
        if args.kvint8:
            cfg = dataclasses.replace(cfg, kv_quant=True)
        model = Seq2Seq(cfg, dtype=jnp.bfloat16)
        enc_ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (args.b, args.enc_len)),
            dtype=jnp.int32)
        enc_mask = jnp.ones_like(enc_ids)
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), enc_ids, enc_mask,
                               enc_ids[:, :4]))()
        if args.int8:
            from video_chapter_generation_tpu.ops.quantize import (
                quantize_seq2seq,
            )
            variables = jax.jit(quantize_seq2seq)(variables)
            model = Seq2Seq(dataclasses.replace(cfg, weight_quant=True),
                            dtype=jnp.bfloat16)
        if args.bf16params:
            from video_chapter_generation_tpu.ops.quantize import (
                cast_serving_params,
            )
            variables = jax.jit(cast_serving_params)(variables)

        if args.what == "encode":
            @jax.jit
            def fn(v, ids, mask):
                return model.apply(v, ids, mask,
                                   method=model.encode).astype(jnp.float32)

            fargs = (variables, enc_ids, enc_mask)
        else:
            @jax.jit
            def fn(v, ids, mask):
                out_ids, _ = generate(model, v, ids, mask,
                                      max_len=args.out_len)
                return out_ids

            fargs = (variables, enc_ids, enc_mask)

    trace_dir = tempfile.mkdtemp(prefix=f"text_{args.what}_")
    capture(fn, fargs, trace_dir)
    evs = load_device_events(trace_dir)
    total = summarize(evs, top=args.top)
    if args.what == "decode":
        steps = args.out_len
        print(f"\nper-decode-step (incl. encoder amortized): "
              f"{total/steps:.3f} ms over {steps} steps")
    if args.keep:
        print(f"trace: {trace_dir}")


if __name__ == "__main__":
    main()
