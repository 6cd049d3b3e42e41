"""Dump per-clip vision embeddings (convert2vision_emb.py replacement).

    python -m video_chapter_generation_tpu.cli.extract_vision_emb \
        data.test_clips_json=clips.json eval.out_dir=vision_embs
"""

from __future__ import annotations

import json
import sys

import jax

from ..data.clip_grid import ClipInfo
from ..models.resnet import Resnet50TSM, ResNet
from ..pipeline.vision_emb import extract_vision_embs, make_vision_embed_fn
from .common import parse_config


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    out_dir = "vision_embs"
    if "--out_dir" in argv:
        i = argv.index("--out_dir")
        out_dir = argv[i + 1]
        del argv[i : i + 2]
    int8 = "--int8" in argv
    if int8:
        argv.remove("--int8")

    cfg, args = parse_config(argv, "extract vision embeddings")
    with open(cfg.data.test_clips_json) as f:
        clips = [ClipInfo.from_json(d) for d in json.load(f)]

    import jax.numpy as jnp

    seg = cfg.data.clip_frame_num
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    # hot path on TPU: frames flow as raw uint8 in space-to-depth order
    # (native decoder emits it; fused stem normalizes in VMEM) — the
    # measured 11.9k frames/s/chip configuration (PERF.md round 2)
    s2d = jax.default_backend() == "tpu" and not args.tiny
    model = Resnet50TSM(
        segments_size=seg, dtype=dtype,
        stem_input="s2d" if s2d else "frames",
        stage_sizes=(1, 1, 1, 1) if args.tiny else None,
    )
    hw = 64 if args.tiny else 224
    if s2d:
        x0 = jnp.zeros((1, seg, hw // 4, hw // 4, 48), jnp.uint8)
    else:
        x0 = jnp.zeros((1, seg, hw, hw, 3), dtype)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )()
    if int8 and s2d:
        # opt-in W8A8 trunk (PERF.md round 3): calibrate activation
        # scales on the first real clip batch, then serve quantized
        import numpy as np

        from ..data.frames import load_clip_frames
        from ..ops.quantize import calibrate_tsm_quant

        ncal = min(len(clips), cfg.data.batch_size)
        cal = np.stack([
            load_clip_frames(clips[i].image_paths, hw, s2d=True)
            for i in range(ncal)])
        scales = calibrate_tsm_quant(model, variables, cal)
        model = model.clone(quantize=True)
        variables = {**variables, "quant": scales}
    embed_fn = make_vision_embed_fn(model, variables)

    count = 0
    for _clip, _emb in extract_vision_embs(
        clips, embed_fn, cfg.data.batch_size, hw, out_dir, s2d=s2d
    ):
        count += 1
    print(f"wrote {count} clip embeddings to {out_dir}")


if __name__ == "__main__":
    main()
