"""Seq2seq differential tests vs HuggingFace Pegasus/BART (tiny random
configs, offline) + KV-cached generation consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.seq2seq import (
    Seq2Seq,
    Seq2SeqConfig,
    Seq2SeqVisionEmb,
    convert_hf_seq2seq,
    generate,
    sinusoidal_positions,
    top_k_filter,
    trim_at_eos,
)


def _inputs(vocab=128, b=2, src=12, tgt=6, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, vocab, size=(b, src)).astype(np.int32)
    mask = np.ones((b, src), np.int32)
    if b > 1:
        mask[1, 9:] = 0
    dec = rng.integers(3, vocab, size=(b, tgt)).astype(np.int32)
    dec[:, 0] = 0
    return ids, mask, dec


@pytest.fixture(scope="module")
def hf_pegasus():
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = transformers.PegasusConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        scale_embedding=False,
    )
    torch.manual_seed(0)
    model = transformers.PegasusForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ours_pegasus(hf_pegasus):
    cfg = Seq2SeqConfig.tiny(activation="gelu", scale_embedding=False)
    variables = convert_hf_seq2seq(hf_pegasus.state_dict(), cfg)
    return Seq2Seq(cfg), variables, cfg


def test_sinusoidal_matches_hf(hf_pegasus):
    hf_table = (
        hf_pegasus.model.encoder.embed_positions.weight.detach().numpy()
    )
    ours = sinusoidal_positions(hf_table.shape[0], hf_table.shape[1])
    np.testing.assert_allclose(ours, hf_table, atol=1e-5)


def test_teacher_forced_logits_match_hf(hf_pegasus, ours_pegasus):
    import torch

    model, variables, cfg = ours_pegasus
    ids, mask, dec = _inputs()
    ours = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                       jnp.asarray(dec))
    with torch.no_grad():
        theirs = hf_pegasus(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.from_numpy(dec).long(),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_cached_generate_matches_teacher_forced_greedy(ours_pegasus):
    """The KV-cached scan must emit exactly the tokens a cacheless greedy
    loop would (the reference's pegasus_hugface.py:117-142 semantics)."""
    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs()
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    gen_ids, gen_logits = generate(model, variables, ids_j, mask_j, max_len=8)

    # cacheless loop: re-run the full decode each step, argmax the last pos
    cur = jnp.zeros((ids.shape[0], 1), jnp.int32)  # decoder_start = 0
    for step in range(8):
        logits = model.apply(variables, ids_j, mask_j, cur)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        # freeze rows that already emitted eos
        prev_done = (cur[:, 1:] == cfg.eos_token_id).any(axis=-1)
        nxt = jnp.where(prev_done, cfg.eos_token_id, nxt)
        np.testing.assert_array_equal(
            np.asarray(gen_ids[:, step]), np.asarray(nxt),
            err_msg=f"divergence at step {step}",
        )
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)


def test_generate_matches_hf_generate(hf_pegasus, ours_pegasus):
    import torch

    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs(b=1)
    gen_ids, _ = generate(model, variables, jnp.asarray(ids),
                          jnp.asarray(mask), max_len=10)
    ours_row = trim_at_eos(gen_ids, cfg.eos_token_id)[0]

    with torch.no_grad():
        hf_out = hf_pegasus.generate(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            max_new_tokens=10, num_beams=1, do_sample=False,
            forced_eos_token_id=None,
        )
    hf_row = list(hf_out[0].numpy())[1:]  # drop decoder start token
    n = min(len(ours_row), len(hf_row))
    assert ours_row[:n] == hf_row[:n]


@pytest.mark.parametrize(
    "length_penalty,early_stopping",
    [(1.0, False), (2.0, False), (0.6, True), (1.0, "never")],
)
def test_beam_search_matches_hf_generate(hf_pegasus, ours_pegasus,
                                         length_penalty, early_stopping):
    """num_beams=4 differential vs HF `generate` incl. length penalty and
    every early_stopping mode — the place beam implementations silently
    diverge (candidate banking, frozen-length normalization, HF's
    loop-termination heuristics)."""
    import torch

    from video_chapter_generation_tpu.models.seq2seq import beam_search

    model, variables, cfg = ours_pegasus
    max_len = 12
    for seed in range(3):
        ids, mask, _ = _inputs(b=2, seed=seed)
        ours_ids, ours_scores = beam_search(
            model, variables, jnp.asarray(ids), jnp.asarray(mask),
            num_beams=4, max_len=max_len, length_penalty=length_penalty,
            early_stopping=early_stopping,
        )
        with torch.no_grad():
            hf_out = hf_pegasus.generate(
                input_ids=torch.from_numpy(ids).long(),
                attention_mask=torch.from_numpy(mask).long(),
                max_new_tokens=max_len, num_beams=4, do_sample=False,
                length_penalty=length_penalty, early_stopping=early_stopping,
                forced_eos_token_id=None, output_scores=True,
                return_dict_in_generate=True,
            )
        ours_rows = trim_at_eos(ours_ids, cfg.eos_token_id)
        for r in range(ids.shape[0]):
            hf_row = list(hf_out.sequences[r].numpy())[1:]  # drop start tok
            if cfg.eos_token_id in hf_row:
                hf_row = hf_row[: hf_row.index(cfg.eos_token_id)]
            assert ours_rows[r] == hf_row, (
                f"seed {seed} row {r}: {ours_rows[r]} vs {hf_row}")
        np.testing.assert_allclose(
            np.asarray(ours_scores),
            hf_out.sequences_scores.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"seed {seed} normalized beam scores",
        )


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert np.isinf(out[0, 0]) and out[0, 0] < 0
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0
    assert np.isinf(out[0, 3]) and out[0, 3] < 0


@pytest.fixture(scope="module")
def hf_bart():
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=66,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BartForConditionalGeneration(cfg)
    model.eval()
    return model


def test_bart_teacher_forced_logits_match_hf(hf_bart):
    import torch

    # HF's BartLearnedPositionalEmbedding allocates max_position+2 rows, so
    # match its table with max_positions=66 and offset 2
    cfg = Seq2SeqConfig.tiny(
        activation="gelu", pre_norm=False, learned_positions=True,
        position_offset=2, scale_embedding=False, embed_layernorm=True,
        pad_token_id=1, eos_token_id=2, decoder_start_token_id=2,
        max_positions=66,
    )
    variables = convert_hf_seq2seq(hf_bart.state_dict(), cfg)
    model = Seq2Seq(cfg)
    ids, mask, dec = _inputs()
    ours = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                       jnp.asarray(dec))
    with torch.no_grad():
        theirs = hf_bart(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.from_numpy(dec).long(),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_vision_emb_model():
    cfg = Seq2SeqConfig.tiny(activation="gelu", scale_embedding=False)
    model = Seq2SeqVisionEmb(cfg, fusion_type="cross_attn",
                             vision_emb_size=64)
    ids, mask, dec = _inputs()
    vis = jnp.ones((2, 5, 64))
    vmask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32))
    v = model.init(jax.random.PRNGKey(0), vis, vmask, jnp.asarray(ids),
                   jnp.asarray(mask), jnp.asarray(dec))
    logits = model.apply(v, vis, vmask, jnp.asarray(ids), jnp.asarray(mask),
                         jnp.asarray(dec))
    assert logits.shape == (2, 6, 128)
    # vision embeddings must influence the logits
    logits2 = model.apply(v, vis * 3.0, vmask, jnp.asarray(ids),
                          jnp.asarray(mask), jnp.asarray(dec))
    assert float(jnp.abs(logits - logits2).max()) > 1e-5

    # mlp fusion variant (implemented as the reference intended)
    m2 = Seq2SeqVisionEmb(cfg, fusion_type="mlp", vision_emb_size=64)
    v2 = m2.init(jax.random.PRNGKey(1), vis, vmask, jnp.asarray(ids),
                 jnp.asarray(mask), jnp.asarray(dec))
    out2 = m2.apply(v2, vis, vmask, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(dec))
    assert out2.shape == (2, 6, 128)


def test_beam_search_beam1_matches_greedy(ours_pegasus):
    from video_chapter_generation_tpu.models.seq2seq import beam_search

    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs(b=2)
    greedy_ids, _ = generate(model, variables, jnp.asarray(ids),
                             jnp.asarray(mask), max_len=8)
    beam_ids, _ = beam_search(model, variables, jnp.asarray(ids),
                              jnp.asarray(mask), num_beams=1, max_len=8)
    np.testing.assert_array_equal(np.asarray(greedy_ids),
                                  np.asarray(beam_ids))


def test_beam_search_finds_higher_likelihood(ours_pegasus):
    """Beam>1 must return a sequence with log-likelihood >= greedy's."""
    from video_chapter_generation_tpu.models.seq2seq import beam_search

    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs(b=2)
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    def seq_logp(dec_rows):
        """Sum log p of each row under teacher forcing (up to first eos)."""
        b = dec_rows.shape[0]
        dec_in = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), dec_rows[:, :-1]], axis=1
        )
        logits = model.apply(variables, ids_j, mask_j, dec_in)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        picked = jnp.take_along_axis(logp, dec_rows[:, :, None], 2)[:, :, 0]
        # mask after first eos
        is_eos = dec_rows == cfg.eos_token_id
        after = jnp.cumsum(jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), is_eos[:, :-1].astype(jnp.int32)],
            axis=1), axis=1) > 0
        return jnp.where(after, 0.0, picked).sum(-1)

    g_ids, _ = generate(model, variables, ids_j, mask_j, max_len=8)
    b_ids, _ = beam_search(model, variables, ids_j, mask_j, num_beams=4,
                           max_len=8)
    lp_g = np.asarray(seq_logp(g_ids))
    lp_b = np.asarray(seq_logp(b_ids))
    assert (lp_b >= lp_g - 1e-4).all(), (lp_b, lp_g)


def test_beam_search_eos_freeze(ours_pegasus):
    from video_chapter_generation_tpu.models.seq2seq import beam_search

    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs(b=1)
    out, scores = beam_search(model, variables, jnp.asarray(ids),
                              jnp.asarray(mask), num_beams=3, max_len=10)
    row = list(np.asarray(out[0]))
    if cfg.eos_token_id in row:
        i = row.index(cfg.eos_token_id)
        assert all(x == cfg.eos_token_id for x in row[i:])
    assert np.isfinite(np.asarray(scores)).all()


def test_beam_search_jittable(ours_pegasus):
    """beam_search must compile as ONE program (lax.scan, static buffer)
    and match its eager result."""
    from video_chapter_generation_tpu.models.seq2seq import beam_search

    model, variables, cfg = ours_pegasus
    ids, mask, _ = _inputs(b=2)
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    eager_ids, eager_scores = beam_search(model, variables, ids_j, mask_j,
                                          num_beams=3, max_len=8)
    jitted = jax.jit(lambda v, i, m: beam_search(model, v, i, m,
                                                 num_beams=3, max_len=8))
    jit_ids, jit_scores = jitted(variables, ids_j, mask_j)
    np.testing.assert_array_equal(np.asarray(eager_ids), np.asarray(jit_ids))
    np.testing.assert_allclose(np.asarray(eager_scores),
                               np.asarray(jit_scores), rtol=1e-5)


def test_remat_matches_no_remat(ours_pegasus):
    """cfg.remat=True (nn.remat with positional static_argnums for
    'deterministic') must be a pure memory/FLOPs trade: identical param
    tree, identical logits, identical grads vs remat=False. Guards the
    positional-argument contract of EncoderLayer/DecoderLayer.__call__
    (a signature reorder would silently mis-trace the static argnums)."""
    import dataclasses

    import optax

    _, variables, cfg = ours_pegasus
    rcfg = dataclasses.replace(cfg, remat=True)
    model, rmodel = Seq2Seq(cfg), Seq2Seq(rcfg)
    ids, mask, dec = _inputs()
    ids_j, mask_j, dec_j = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(dec)

    # same param tree (remat wraps the class, must not rename params)
    rvars = jax.jit(lambda: rmodel.init(
        jax.random.PRNGKey(0), ids_j, mask_j, dec_j))()
    assert jax.tree_util.tree_structure(rvars) == (
        jax.tree_util.tree_structure(variables))

    # identical logits under the converted weights
    out = model.apply(variables, ids_j, mask_j, dec_j)
    rout = rmodel.apply(variables, ids_j, mask_j, dec_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rout),
                               rtol=1e-5, atol=1e-5)

    # identical grads (remat recomputes, must not change the math)
    def loss(m):
        def f(v):
            logits = m.apply(v, ids_j, mask_j, dec_j)
            labels = jnp.roll(dec_j, -1, axis=1)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        return f

    g = jax.grad(loss(model))(variables)
    rg = jax.grad(loss(rmodel))(variables)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(g, rg, rtol=1e-4, atol=1e-5)

    # dropout branch: train mode (deterministic=False) must trace too
    def tloss(v):
        logits = rmodel.apply(
            v, ids_j, mask_j, dec_j, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
        labels = jnp.roll(dec_j, -1, axis=1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    tval = jax.jit(tloss)(variables)
    assert np.isfinite(float(tval))
