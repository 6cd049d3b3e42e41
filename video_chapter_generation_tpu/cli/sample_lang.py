"""Sample continuations from a pretrained subtitle language model.

The reference ships sample-and-print drivers for its LMs
(train_lang/test_gpt.py:91-108 "generate self-defined sentence",
test_gpt_hugface.py:114-125): seed prompts, 2 samples each,
temperature 1.0, top_k 10. This CLI is that surface for every
pretrain_lang task:

    python -m video_chapter_generation_tpu.cli.sample_lang \
        data.data_file=... data.train_vid_file=... train.ckpt_dir=... \
        --task next_token_gpt [--glove_vocab vocab.txt] \
        [--prompt "let's get cooking the first"] [--num_samples 2] \
        [--temperature 1.0] [--top_k 10] [--max_new_tokens 20] [--greedy]

`--task next_token_gpt` samples the from-scratch word-level GPT via the
jitted scan sampler (models/gpt.py gpt_generate); `next_token_glove`
follows the reference's token_embedding_sample loop
(common_utils/language_model_utils.py:49-80) — sample a vocab id, feed
that word's GloVe embedding back; `next_token` samples the BERT
next-token pretrain head by full re-forward per step (the reference LMs
have no KV cache either). Prints `prompt * continuation` per sample.
"""

from __future__ import annotations

# the reference's self-defined seed sentences (test_gpt.py:94)
DEFAULT_PROMPTS = [
    "let's get cooking the first",
    "so the first game of the day",
]


def main(argv=None):
    import sys

    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..datasetkit.parsing import text_decontracted
    from ..models.gpt import sample_next
    from ..train.tasks import (
        GptGlovePretrainTask,
        GptPretrainTask,
        LangPretrainTask,
    )
    from .common import load_bert_tokenizer, load_corpus, parse_config
    from .eval_title import _restore
    from .pretrain_lang import load_word_vocab

    argv = list(argv if argv is not None else sys.argv[1:])

    def opt(flag, default=None, cast=str):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    task_name = opt("--task", "next_token_gpt")
    glove_path = opt("--glove")
    glove_vocab = opt("--glove_vocab")
    num_samples = opt("--num_samples", 2, int)
    temperature = opt("--temperature", 1.0, float)
    top_k = opt("--top_k", 10, int)
    max_new_tokens = opt("--max_new_tokens", 20, int)
    greedy = "--greedy" in argv
    if greedy:
        argv.remove("--greedy")
    prompts = []
    while "--prompt" in argv:
        prompts.append(opt("--prompt"))
    prompts = prompts or DEFAULT_PROMPTS

    cfg, args = parse_config(argv, "sample subtitle language model")
    corpus = load_corpus(cfg, "train")
    sample = not greedy
    rng = jax.random.PRNGKey(cfg.train.seed)

    from ..core.contract import vocab_hash

    if task_name == "next_token_gpt":
        vocab = load_word_vocab(glove_vocab, corpus)
        task = GptPretrainTask(cfg, vocab_size=len(vocab), tiny=args.tiny)
        task.contract = dict(task.contract, vocab_hash=vocab_hash(vocab))
        variables = _restore(cfg, task)
        token2id = {t: i for i, t in enumerate(vocab)}

        from ..models.gpt import gpt_generate

        for prompt in prompts:
            context = [w for w in text_decontracted(prompt).split(" ")
                       if w in token2id]
            if not context:
                print(f"{prompt} * <no in-vocab prompt words>")
                continue
            ids = jnp.asarray([[token2id[w] for w in context]], jnp.int32)
            for _ in range(num_samples):
                rng, sub = jax.random.split(rng)
                out = gpt_generate(
                    task.model, variables, ids,
                    max_new_tokens=max_new_tokens, temperature=temperature,
                    top_k=top_k, sample=sample, rng=sub,
                )
                completion = " ".join(vocab[int(i)] for i in
                                      np.asarray(out[0]))
                print(prompt + " * " + completion)

    elif task_name == "next_token_glove":
        from ..datasetkit.glove import load_glove_pickle, load_glove_txt

        table = (load_glove_pickle(glove_path)
                 if glove_path.endswith((".pkl", ".pickle"))
                 else load_glove_txt(glove_path))
        vocab = (load_word_vocab(glove_vocab, corpus) if glove_vocab
                 else sorted(table))
        emb_dim = len(next(iter(table.values())))
        task = GptGlovePretrainTask(cfg, vocab_size=len(vocab),
                                    tiny=args.tiny, emb_dim=emb_dim)
        task.contract = dict(task.contract, vocab_hash=vocab_hash(vocab))
        variables = _restore(cfg, task)
        fwd = jax.jit(lambda v, x: task.model.apply(v, x))

        def word_emb(w):
            e = table.get(w)
            return (np.zeros(emb_dim, np.float32) if e is None
                    else np.asarray(e, np.float32))

        for prompt in prompts:
            context = [w for w in text_decontracted(prompt).split(" ") if w]
            for _ in range(num_samples):
                embs = [word_emb(w) for w in context]
                words = []
                for _step in range(max_new_tokens):
                    x = jnp.asarray(np.stack(embs)[None])
                    logits = fwd(variables, x)
                    rng, sub = jax.random.split(rng)
                    nxt = int(sample_next(sub, logits,
                                          temperature=temperature,
                                          top_k=top_k, sample=sample)[0])
                    words.append(vocab[nxt])
                    embs.append(word_emb(vocab[nxt]))
                print(prompt + " * " + " ".join(words))

    elif task_name == "next_token":
        tokenizer = load_bert_tokenizer(args, corpus)
        task = LangPretrainTask(cfg, vocab_size=tokenizer.vocab_size,
                                tiny=args.tiny)
        task.contract = dict(task.contract, vocab_hash=vocab_hash(tokenizer))
        variables = _restore(cfg, task)
        fwd = jax.jit(lambda v, ids, mask: task.model.apply(v, ids, mask)[0])

        for prompt in prompts:
            base = tokenizer.convert_tokens_to_ids(
                tokenizer.tokenize(text_decontracted(prompt)))
            for _ in range(num_samples):
                ids = list(base)
                out_ids = []
                for _step in range(max_new_tokens):
                    a = jnp.asarray([ids], jnp.int32)
                    logits = fwd(variables, a, jnp.ones_like(a))
                    rng, sub = jax.random.split(rng)
                    nxt = int(sample_next(sub, logits,
                                          temperature=temperature,
                                          top_k=top_k, sample=sample)[0])
                    ids.append(nxt)
                    out_ids.append(nxt)
                print(prompt + " * " + tokenizer.decode(out_ids))
    else:
        raise SystemExit(f"unknown --task {task_name}")


if __name__ == "__main__":
    main()
