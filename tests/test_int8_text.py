"""Weight-only int8 serving of the seq2seq title models
(models/quant_layers.py + ops/quantize.quantize_seq2seq +
Seq2SeqConfig.weight_quant).

Decode on TPU is weight-streaming-bound; int8 weights with per-channel
scales halve HBM traffic vs bf16 (the int8->bf16 convert fuses into the
matmul — tools/probe_int8_text.py, PERF.md round 3). These tests pin the
mechanics on CPU: layer-level exactness against the explicit dequant
math, bounded whole-model logit drift, the scoped param-tree transform,
and every serving entry (generate / beam_search / vision-emb fused
encode) running on the quantized tree.

Reference surface: the title stage of test_whole_pipeline_per_video.py,
served via pegasus_hugface.py:105-146 (fp32, cacheless) — quantized
serving is a TPU-native extension, opt-in."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.models.quant_layers import (
    Int8Dense,
    Int8Embed,
    quantize_weight,
)
from video_chapter_generation_tpu.models.seq2seq import (
    Seq2Seq,
    Seq2SeqConfig,
    Seq2SeqVisionEmb,
    beam_search,
    generate,
)
from video_chapter_generation_tpu.ops.quantize import (
    cast_serving_params,
    quantize_seq2seq,
)


def _tiny_pair(seed=0, **cfg_kw):
    """(float model, float vars, quant model, quant vars, ids, mask)."""
    cfg = Seq2SeqConfig.tiny(**cfg_kw)
    model = Seq2Seq(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    variables = model.init(jax.random.PRNGKey(seed), ids, mask, ids[:, :5])
    qmodel = Seq2Seq(dataclasses.replace(cfg, weight_quant=True))
    qvars = quantize_seq2seq(variables)
    return model, variables, qmodel, qvars, ids, mask


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    q, s = quantize_weight(w, axis=0)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    err = np.abs(np.asarray(w) - np.asarray(q, np.float32) * np.asarray(s))
    # symmetric rounding: elementwise error <= scale/2 per output channel
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_int8_dense_matches_dequant_math():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    q, s = quantize_weight(w, axis=0)
    layer = Int8Dense(8)
    y = layer.apply({"params": {"kernel_q": q, "scale": s, "bias": b}}, x)
    ref = x @ (np.asarray(q, np.float32) * np.asarray(s)) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_int8_embed_lookup_and_logits_consistent():
    """The tied table must round identically in both of its uses."""
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    q, s = quantize_weight(emb, axis=1)
    layer = Int8Embed(32, 16)
    v = {"params": {"embedding_q": q, "scale": s}}
    ids = jnp.asarray([[0, 5, 31]], jnp.int32)
    rows = layer.apply(v, ids)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    np.testing.assert_allclose(np.asarray(rows)[0], deq[[0, 5, 31]],
                               rtol=1e-5, atol=1e-6)
    hidden = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    logits = layer.apply(v, hidden, method=layer.logits)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(hidden) @ deq.T,
                               rtol=1e-4, atol=1e-4)


def test_quantize_seq2seq_scopes_to_core():
    """Only enc/dec layers + shared (+lm_head) transform; composed-model
    siblings (fusion head) keep float kernels."""
    cfg = Seq2SeqConfig.tiny()
    model = Seq2SeqVisionEmb(cfg, fusion_type="cross_attn",
                             vision_emb_size=24)
    ids = jnp.ones((1, 6), jnp.int32)
    vis = jnp.zeros((1, 3, 24))
    vmask = jnp.ones((1, 3), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), vis, vmask, ids,
                           jnp.ones_like(ids), ids[:, :3])
    qvars = quantize_seq2seq(variables)
    p = qvars["params"]["seq2seq"]
    assert "kernel_q" in p["enc_layer0"]["self_attn"]["q_proj"]
    assert "embedding_q" in p["shared"]
    fusion = qvars["params"]["fusion_head"]["fusion_head"]
    assert "kernel" in fusion["query"]  # untouched float Dense
    assert fusion["query"]["kernel"].dtype == jnp.float32


@pytest.mark.parametrize("cfg_kw", [
    {},  # pegasus-style: tied head, sinusoidal positions, pre-norm
    {"pre_norm": False, "learned_positions": True, "position_offset": 2,
     "tie_lm_head": False, "embed_layernorm": True},  # bart-style
])
def test_quantized_logits_close(cfg_kw):
    model, v, qmodel, qv, ids, mask = _tiny_pair(**cfg_kw)
    ref = model.apply(v, ids, mask, ids[:, :5])
    got = qmodel.apply(qv, ids, mask, ids[:, :5])
    assert _cos(ref, got) > 0.999


def test_generate_return_logits_flag_and_quantized_greedy():
    model, v, qmodel, qv, ids, mask = _tiny_pair(seed=3)
    ids_f, logits_f = generate(model, v, ids, mask, max_len=8)
    ids_q, logits_q = generate(qmodel, qv, ids, mask, max_len=8)
    ids_q2, none = generate(qmodel, qv, ids, mask, max_len=8,
                            return_logits=False)
    assert none is None
    assert (np.asarray(ids_q2) == np.asarray(ids_q)).all()
    assert logits_f.shape == logits_q.shape == (2, 8, model.cfg.vocab_size)
    # greedy ids from the quantized model match the float model on a tiny
    # net (weight-rounding error well below the argmax margins here)
    assert (np.asarray(ids_f) == np.asarray(ids_q)).all()
    # float path unchanged by the flag
    ids_f2, none_f = generate(model, v, ids, mask, max_len=8,
                              return_logits=False)
    assert none_f is None and (np.asarray(ids_f2) == np.asarray(ids_f)).all()


def test_beam_search_on_quantized_model():
    _, _, qmodel, qv, ids, mask = _tiny_pair(seed=4)
    out, scores = beam_search(qmodel, qv, ids, mask, max_len=6, num_beams=3)
    assert out.shape == (2, 6)
    assert np.isfinite(np.asarray(scores)).all()


def test_vision_emb_quantized_end_to_end():
    cfg = Seq2SeqConfig.tiny()
    model = Seq2SeqVisionEmb(cfg, vision_emb_size=24)
    ids = jnp.ones((2, 6), jnp.int32)
    rng = np.random.default_rng(5)
    vis = jnp.asarray(rng.standard_normal((2, 3, 24)), jnp.float32)
    vmask = jnp.ones((2, 3), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), vis, vmask, ids,
                           jnp.ones_like(ids), ids[:, :3])
    ref = model.apply(variables, vis, vmask, ids, jnp.ones_like(ids),
                      ids[:, :3])
    qmodel = model.clone(cfg=dataclasses.replace(cfg, weight_quant=True))
    qvars = quantize_seq2seq(variables)
    got = qmodel.apply(qvars, vis, vmask, ids, jnp.ones_like(ids),
                       ids[:, :3])
    assert _cos(ref, got) > 0.999
    # fused encode + inner decode (the cli/infer_video serving shape)
    enc = qmodel.apply(qvars, vis, vmask, ids, jnp.ones_like(ids),
                       method=qmodel.encode_fused)
    inner = Seq2Seq(dataclasses.replace(cfg, weight_quant=True))
    gen_ids, _ = generate(inner, {"params": qvars["params"]["seq2seq"]},
                          ids, jnp.ones_like(ids), max_len=5,
                          enc_hidden_override=enc, return_logits=False)
    assert gen_ids.shape == (2, 5)


def test_kv_quant_greedy_matches_float():
    """int8 cross-attention K/V cache (cfg.kv_quant): the per-(batch,
    head,channel) scales fold exactly into q / ctx, so the only error is
    K/V rounding — greedy ids match the float model on a tiny net and
    logits stay close."""
    model, v, _, _, ids, mask = _tiny_pair(seed=7)
    kvmodel = Seq2Seq(dataclasses.replace(model.cfg, kv_quant=True))
    ids_f, logits_f = generate(model, v, ids, mask, max_len=8)
    ids_kv, logits_kv = generate(kvmodel, v, ids, mask, max_len=8)
    assert (np.asarray(ids_f) == np.asarray(ids_kv)).all()
    assert _cos(logits_f, logits_kv) > 0.999


def test_kv_quant_beam_search_and_combined():
    """kv_quant composes with weight_quant and survives beam reordering
    (gather_beams maps over the 4-tuple int8 cache leaves)."""
    _, _, qmodel, qv, ids, mask = _tiny_pair(seed=8)
    combo = Seq2Seq(dataclasses.replace(qmodel.cfg, kv_quant=True))
    out, scores = beam_search(combo, qv, ids, mask, max_len=6, num_beams=3)
    assert out.shape == (2, 6)
    assert np.isfinite(np.asarray(scores)).all()
    gen_ids, none = generate(combo, qv, ids, mask, max_len=6,
                             return_logits=False)
    assert none is None and gen_ids.shape == (2, 6)


def test_cast_serving_params_dtypes():
    model, v, _, qv, ids, mask = _tiny_pair(seed=6)
    bf = cast_serving_params(v)
    leaves = jax.tree_util.tree_leaves(bf["params"])
    assert all(x.dtype == jnp.bfloat16 for x in leaves
               if jnp.issubdtype(x.dtype, jnp.floating))
    # int8 leaves pass through untouched
    qbf = cast_serving_params(qv)
    k = qbf["params"]["enc_layer0"]["self_attn"]["q_proj"]["kernel_q"]
    assert k.dtype == jnp.int8
    # the cast tree still runs
    out = model.apply(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if x.dtype == jnp.bfloat16 else x, bf), ids, mask, ids[:, :5])
    assert np.isfinite(np.asarray(out, np.float32)).all()
