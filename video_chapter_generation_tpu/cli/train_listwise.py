"""ListNet listwise finetuning (train_lang/train_listwise.py replacement):
slates of [1 positive + k negative] clips per video, ListNet top-1 loss +
auxiliary binary CE.

    python -m video_chapter_generation_tpu.cli.train_listwise \
        data.data_file=... data.train_vid_file=... --bert_vocab v.txt
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

from ..core.seeding import host_rng
from ..data.clip_grid import subtitle_text_for_window
from ..data.datasets import _video_clip_structure
from ..data.text_encode import encode_clip_text


class ListwiseSlateDataset:
    """2 positives + k negatives per video (YoutubeListwiseClipDataset,
    youtube_dataset.py:1195-1388): slot 0 = a positive clip; contrast slots
    = 1 positive + k negatives; relevance one-hot on the contrast positive."""

    def __init__(self, corpus, tokenizer, clip_frame_num=16, max_text_len=100,
                 num_negatives=4, seed=123, fps=1):
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.clip_frame_num = clip_frame_num
        self.max_text_len = max_text_len
        self.num_negatives = num_negatives
        self.seed = seed
        self.fps = fps

    def __len__(self):
        return len(self.corpus.vids)

    def __getitem__(self, i: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        rng = host_rng(self.seed, epoch, i)
        vid = self.corpus.vids[i]
        image_num, _, clips, labels = _video_clip_structure(
            self.corpus, vid, self.clip_frame_num, self.fps, "infer"
        )
        pos = np.flatnonzero(labels == 1)
        neg = np.flatnonzero(labels == 0)
        slate_len = 2 + self.num_negatives
        subs = self.corpus.subtitles(vid)

        if len(pos) == 0:  # degenerate video: all-negative slate
            chosen = list(rng.choice(neg, size=slate_len, replace=True))
            relevance = np.zeros(slate_len, np.float32)
        else:
            p = rng.choice(pos, size=2, replace=len(pos) < 2)
            n = rng.choice(neg, size=self.num_negatives,
                           replace=len(neg) < self.num_negatives)
            contrast = list(n) + [int(p[1])]
            rng.shuffle(contrast)
            chosen = [int(p[0])] + contrast
            relevance = np.zeros(slate_len, np.float32)
            relevance[1 + contrast.index(int(p[1]))] = 1.0

        ids = np.zeros((slate_len, self.max_text_len), np.int32)
        masks = np.zeros_like(ids)
        slate_labels = np.zeros(slate_len, np.int32)
        for k, ci in enumerate(chosen):
            text = subtitle_text_for_window(
                subs, clips[ci][0], clips[ci][1], 1 * self.fps, fps=self.fps
            )
            ids[k], masks[k] = encode_clip_text(
                text, self.tokenizer, self.max_text_len
            )
            slate_labels[k] = labels[ci]
        return {
            "text_ids": ids, "attention_mask": masks,
            "relevance": relevance, "slate_labels": slate_labels,
        }


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.loader import DataLoader
    from ..models.bert import BertConfig
    from ..models.contrastive import ListwiseBert
    from ..train.optim import make_optimizer
    from .common import load_bert_tokenizer, load_corpus, parse_config

    cfg, args = parse_config(argv, "listwise (ListNet) finetuning")
    corpus = load_corpus(cfg, "train")
    tokenizer = load_bert_tokenizer(args, corpus)

    bert_cfg = (BertConfig.tiny(vocab_size=tokenizer.vocab_size)
                if args.tiny else BertConfig())
    lw = ListwiseBert(bert_cfg)
    params = lw.init_variables(jax.random.PRNGKey(cfg.train.seed))
    tx = make_optimizer(cfg.optim, params)
    opt_state = tx.init(params)

    ds = ListwiseSlateDataset(
        corpus, tokenizer, cfg.data.clip_frame_num, cfg.data.max_text_len,
        seed=cfg.train.seed,
    )
    loader = DataLoader(ds, cfg.data.batch_size, seed=cfg.train.seed)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            b, s, L = batch["text_ids"].shape
            # balanced binary head over the whole slate
            balance_idx = jnp.arange(b * s)
            out = lw.train_forward(
                p, batch["text_ids"], batch["attention_mask"],
                batch["relevance"], balance_idx,
                batch["slate_labels"].reshape(-1),
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    for epoch in range(cfg.train.max_epochs):
        t0 = time.time()
        losses = []
        for batch in loader(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)
    return params


if __name__ == "__main__":
    main()
