"""Train/val/test split of the all-in-one CSV.

Port of split_dataset.py:14-58: fixed seed 123, shuffle vid list,
70/10/20 split, one vid per line.

    python -m video_chapter_generation_tpu.datasetkit.split \
        --data_file all_in_one.csv --out_dir dataset/
"""

from __future__ import annotations

import argparse
import os
import random
from typing import List, Optional

from .parsing import parse_csv_to_list


def split_vids(vids: List[str], seed: int = 123,
               ratios=(0.7, 0.1, 0.2)):
    rng = random.Random(seed)
    vids = list(vids)
    rng.shuffle(vids)
    n = len(vids)
    n_train = int(n * ratios[0])
    n_val = int(n * ratios[1])
    return (
        vids[:n_train],
        vids[n_train : n_train + n_val],
        vids[n_train + n_val :],
    )


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_file", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args(argv)

    vids, *_ = parse_csv_to_list(args.data_file)
    train, val, test = split_vids(vids, args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for name, split in (("train", train), ("val", val), ("test", test)):
        path = os.path.join(args.out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write("\n".join(split) + "\n")
        print(f"{name}: {len(split)} vids -> {path}")


if __name__ == "__main__":
    main()
