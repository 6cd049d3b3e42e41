"""AOT Mosaic compile-check for the TPU kernel set — no TPU needed.

The axon tunnel is the only path to a live chip on this rig and it goes
down for long stretches; meanwhile new Pallas kernels (chain, planar,
fusedtrain) compile in interpret mode under the CPU test suite, which
validates numerics but NOT Mosaic's layout/VMEM rules. This tool closes
that gap offline: it builds a deviceless v5e topology
(jax.experimental.topologies — libtpu is present locally even when the
tunnel is not), patches `jax.default_backend()` to "tpu" so trace-time
dispatch picks the real kernel paths (models/resnet.py gates every fused
path on it), and AOT-compiles the target step. A Mosaic rejection
surfaces here exactly as it would on hardware; only timing still needs
the chip.

Targets:
  bench        bench.py hot path (s2d uint8 trunk, chain kernels, B=64)
  bench-nochain  same with chain_blocks=False (round-2 validated set)
  entry        __graft_entry__.entry() flagship forward
  train        full train step (bench_train.py body); --impl/--dtype/--b

Usage: python tools/aot_compile.py --target train --impl fusedtrain \
           --dtype bf16 --b 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup():
    import jax

    jax.config.update("jax_platforms", "cpu")
    # trace-time dispatch override: every fused-kernel gate in the package
    # checks jax.default_backend() == "tpu"; compilation itself targets
    # the topology below, so the patch only affects tracing decisions
    jax.default_backend = lambda: "tpu"

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    td = topologies.get_topology_desc(platform="tpu",
                                      topology_name="v5e:2x2")
    mesh = Mesh(td.devices[:1], ("d",))
    return NamedSharding(mesh, P())


def _sds(tree, s):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s), tree
    )


_HLO_DUMP = None  # set by --hlo: write compiled optimized HLO here


def _report(lowered, name):
    compiled = lowered.compile()
    if _HLO_DUMP:
        with open(_HLO_DUMP, "w") as fh:
            fh.write(compiled.as_text())
        print(f"HLO -> {_HLO_DUMP}")
    ma = compiled.memory_analysis()
    peak = getattr(ma, "temp_size_in_bytes", 0) + getattr(
        ma, "output_size_in_bytes", 0
    )
    print(f"COMPILED {name}: temp={getattr(ma, 'temp_size_in_bytes', 0)/2**20:.0f}MB "
          f"args={getattr(ma, 'argument_size_in_bytes', 0)/2**20:.0f}MB "
          f"out+temp={peak/2**20:.0f}MB")
    return compiled


def check_bench(s, chain: bool):
    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.models.resnet import ResNet

    B, T, HW = 64, 16, 224
    model = ResNet(depth=50, n_segment=T, dtype=jnp.bfloat16,
                   stem_input="s2d", chain_blocks=chain)
    n4 = HW // 4
    x = jax.ShapeDtypeStruct((B * T, n4, n4, 48), jnp.uint8, sharding=s)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B * T, n4, n4, 48), jnp.uint8),
                           train=False)
    )

    def fwd(v, x):
        return jnp.sum(model.apply(v, x, train=False))

    _report(jax.jit(fwd).lower(_sds(v, s), x),
            f"bench chain={chain}")


def check_entry(s):
    import jax

    import __graft_entry__ as g

    model, (img, ids, mask) = g._flagship(tiny=False)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, ids, mask)
    )

    def fn(v, img, ids, mask):
        logits, _ = model.apply(v, img, ids, mask)
        return logits

    _report(
        jax.jit(fn).lower(_sds(v, s), _sds(img, s), _sds(ids, s),
                          _sds(mask, s)),
        "entry",
    )


def check_train(s, impl, dtype, b):
    import jax
    import jax.numpy as jnp
    import optax

    from video_chapter_generation_tpu.core.config import Config
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames
    from video_chapter_generation_tpu.train.loop import create_train_state
    from video_chapter_generation_tpu.train.objectives import (
        clip_classification_loss,
    )
    from video_chapter_generation_tpu.train.optim import make_optimizer
    from video_chapter_generation_tpu.train.tasks import SegmentWindowTask

    cfg = Config()
    overrides = []
    if impl:
        overrides.append(f"model.tsm_impl={impl}")
    if dtype:
        overrides.append(f"model.compute_dtype={dtype}")
    if overrides:
        cfg = cfg.apply_overrides(overrides)
    hw = 224
    task = SegmentWindowTask(cfg, tiny=False, hw=hw)
    W = 2 * cfg.data.window_size + 1
    seg = cfg.data.clip_frame_num
    L = cfg.data.max_text_len

    variables = jax.eval_shape(task.init_variables)
    tx = make_optimizer(cfg.optim, variables["params"])
    state = jax.eval_shape(lambda v: create_train_state(v, tx), variables)

    def loss_fn(params, batch_stats, batch, key):
        img = normalize_frames(batch["img_clips"],
                               out_dtype=task.dtype)
        (logits, _), mutated = task.model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, batch["text_ids"], jnp.ones_like(batch["text_ids"]),
            deterministic=False, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, mutated["batch_stats"])

    def train_step(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (_, bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=bs, opt_state=opt_state),
            loss,
        )

    batch = {
        "img_clips": jax.ShapeDtypeStruct((b, W, seg, hw, hw, 3),
                                          jnp.uint8, sharding=s),
        "text_ids": jax.ShapeDtypeStruct((b, W, L), jnp.int32, sharding=s),
        "label": jax.ShapeDtypeStruct((b,), jnp.int32, sharding=s),
    }
    key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=s)
    _report(
        jax.jit(train_step).lower(_sds(state, s), batch, key),
        f"train impl={impl} dtype={dtype} b={b}",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="bench",
                    choices=["bench", "bench-nochain", "entry", "train"])
    ap.add_argument("--impl", default="fusedtrain")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hlo", default=None,
                    help="write the compiled optimized HLO to this file "
                         "(for identifying profiler fusions offline)")
    args = ap.parse_args()

    global _HLO_DUMP
    _HLO_DUMP = args.hlo
    s = _setup()
    if args.target == "bench":
        check_bench(s, chain=True)
    elif args.target == "bench-nochain":
        check_bench(s, chain=False)
    elif args.target == "entry":
        check_entry(s)
    else:
        check_train(s, args.impl, args.dtype, args.b)


if __name__ == "__main__":
    main()
