"""Convert pretrained torch checkpoints into this framework's parameters.

Supports:
- torchvision resnet50 state dict        (--kind resnet50)
- HuggingFace BertModel state dict       (--kind bert)
- HF Pegasus/BART ForConditionalGeneration (--kind pegasus|bart)
- the reference's TwoStreamWindow checkpoint {model_state_dict,...}
  (--kind two_stream_window --window_size N --head_type mlp)

Output: a flax-serialized msgpack file loadable with
`flax.serialization.msgpack_restore`.

    python -m video_chapter_generation_tpu.cli.convert_weights \
        --kind bert --torch_ckpt bert.pth --out bert.msgpack
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["resnet50", "bert", "pegasus", "bart",
                            "two_stream_window"])
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--window_size", type=int, default=1)
    p.add_argument("--head_type", default="mlp")
    args = p.parse_args(argv)

    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    # strip DDP 'module.' prefixes
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if args.kind == "resnet50":
        from ..models.resnet import convert_torchvision_resnet50

        variables = convert_torchvision_resnet50(sd)
    elif args.kind == "bert":
        from ..models.bert import convert_hf_bert

        sd = {k.removeprefix("base_model."): v for k, v in sd.items()}
        variables = convert_hf_bert(sd)
    elif args.kind in ("pegasus", "bart"):
        from ..models.seq2seq import Seq2SeqConfig, convert_hf_seq2seq

        cfg = (Seq2SeqConfig.pegasus_large() if args.kind == "pegasus"
               else Seq2SeqConfig.bart_large())
        sd = {k.removeprefix("base_model."): v for k, v in sd.items()}
        variables = convert_hf_seq2seq(sd, cfg)
    else:
        from ..models.convert_reference import convert_two_stream_window

        variables = convert_two_stream_window(sd, args.window_size,
                                              args.head_type)

    import flax.serialization

    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(variables))
    import jax

    n = sum(
        x.size for x in jax.tree_util.tree_leaves(variables)
        if hasattr(x, "size")
    )
    print(f"wrote {n:,} parameters to {args.out}")


if __name__ == "__main__":
    main()
