"""ListNet listwise finetuning (train_lang/train_listwise.py replacement):
slates of [1 positive + k negative] clips per video, ListNet top-1 loss +
auxiliary binary CE.

    python -m video_chapter_generation_tpu.cli.train_listwise \
        data.data_file=... data.train_vid_file=... --bert_vocab v.txt
"""

from __future__ import annotations

import time

import numpy as np

from ..data.datasets import ListwiseSlateDataset  # noqa: F401 (re-export)


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
