"""MoCo contrastive subtitle pretraining (train_lang/
pretrain_constrast_lang_model.py replacement).

The MoCo state (query/key params, negatives queue, pointer) is a single
pytree; the jitted step does encoder forward, InfoNCE, AdamW update on the
query encoder, momentum update and queue rotation in one compiled unit.

    python -m video_chapter_generation_tpu.cli.pretrain_contrastive \
        data.data_file=... data.train_vid_file=... --bert_vocab v.txt
"""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.datasets import ContrastiveSubtitleDataset
    from ..data.loader import DataLoader
    from ..models.bert import BertConfig
    from ..models.contrastive import MoCoTextEncoder
    from ..train.objectives import info_nce_loss
    from ..train.optim import make_optimizer
    from .common import load_bert_tokenizer, load_corpus, parse_config

    cfg, args = parse_config(argv, "MoCo contrastive pretraining")
    corpus = load_corpus(cfg, "train")
    tokenizer = load_bert_tokenizer(args, corpus)

    import dataclasses

    bert_cfg = (
        BertConfig.tiny(vocab_size=tokenizer.vocab_size) if args.tiny
        else dataclasses.replace(BertConfig(),
                                 vocab_size=tokenizer.vocab_size)
    )
    K = 256 if args.tiny else 65536
    enc = MoCoTextEncoder(bert_cfg, K=K, m=0.999, T=0.07)
    state = enc.init_state(jax.random.PRNGKey(cfg.train.seed))
    tx = make_optimizer(cfg.optim, state.params_q)
    opt_state = tx.init(state.params_q)

    ds = ContrastiveSubtitleDataset(
        corpus, tokenizer, num_candidates=4,
        max_text_len=cfg.data.max_text_len, seed=cfg.train.seed,
    )
    loader = DataLoader(ds, cfg.data.batch_size, seed=cfg.train.seed)

    @jax.jit
    def step(state, opt_state, batch):
        def loss_fn(params_q):
            s = state.replace(params_q=params_q)
            logits, labels, new_state = enc.forward(
                s, batch["query_ids"], batch["query_mask"],
                batch["cand_ids"], batch["cand_mask"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = jnp.mean((jnp.argmax(logits, -1) == 0).astype(jnp.float32))
            return loss, (acc, new_state)

        (loss, (acc, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params_q)
        updates, new_opt = tx.update(grads, opt_state, state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)
        return new_state.replace(params_q=params_q), new_opt, loss, acc

    for epoch in range(cfg.train.max_epochs):
        t0 = time.time()
        losses, accs = [], []
        for batch in loader(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, opt_state, loss, acc = step(state, opt_state, batch)
            losses.append(float(loss))
            accs.append(float(acc))
        print(
            f"epoch {epoch}: loss {np.mean(losses):.4f} "
            f"acc {np.mean(accs):.4f} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    return state


if __name__ == "__main__":
    main()
