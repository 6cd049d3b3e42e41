"""One generic pjit training loop for every task.

Replaces the reference's five near-identical Trainer classes (DDP /
DeepSpeed / Accelerate / DataParallel / single-GPU — SURVEY §2.5) with a
single loop:
- the train step is jit-compiled once and runs over the ('data','model')
  mesh; gradients reduce over ICI implicitly through batch sharding
  (the DDP allreduce analogue)
- gradient accumulation via optax.MultiSteps (ddp.py:334-342)
- epoch-based LR multiplier injected into optimizer state (ddp.py:345-375)
- orbax checkpointing with {epoch, score} and resume-latest
  (ddp.py:151-207)
- eval hook returns a score; best checkpoint tracked (best_mode=max)
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import CheckpointManager
from ..core.config import Config
from ..core.metrics import MetricWriter, StepTimer
from ..core.seeding import jax_key
from ..parallel import mesh as pmesh

logger = logging.getLogger(__name__)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any


def create_train_state(variables: Dict, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(loss_fn: Callable, tx) -> Callable:
    """loss_fn(params, batch_stats, batch, rng) ->
    (loss, (metrics_dict, new_batch_stats))."""

    @jax.jit
    def step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_bs, opt_state=opt_state,
        )
        return new_state, metrics

    return step


@dataclasses.dataclass
class Trainer:
    """Generic trainer.

    task must provide:
      init_variables() -> flax variables dict
      loss_fn(params, batch_stats, batch, rng) -> (loss, (metrics, batch_stats))
      eval_fn(state, eval_loader) -> (score: float, metrics: dict)   [optional]
    loaders are callables: epoch -> iterable of host batch dicts.
    """

    cfg: Config
    task: Any
    train_loader: Callable[[int], Iterable]
    eval_loader: Optional[Callable[[int], Iterable]] = None
    mesh: Optional[Any] = None

    def __post_init__(self):
        self.mesh = self.mesh or pmesh.make_mesh(
            data=self.cfg.mesh.data_axis, model=self.cfg.mesh.model_axis
        )
        from .optim import make_optimizer

        variables = self.task.init_variables()
        self.tx = make_optimizer(self.cfg.optim, variables["params"])
        self.state = create_train_state(variables, self.tx)
        self.step_fn = make_train_step(self.task.loss_fn, self.tx)
        self.ckpt = CheckpointManager(
            self.cfg.train.ckpt_dir, max_to_keep=self.cfg.train.keep_checkpoints
        )
        self.writer = MetricWriter(self.cfg.train.log_dir)
        self.timer = StepTimer()
        self.best_result = float("-inf")
        self.start_epoch = 0
        # shard FIRST so resume restores straight into the mesh layout
        # (ZeRO-sharded opt_state restores as shards, never host-replicated
        # — the multi-chip lifecycle a pod run needs)
        self._apply_shardings()
        if self.cfg.train.resume:
            self._try_resume()

    def _apply_shardings(self):
        """Replicate params/batch_stats over the mesh; ZeRO-shard the
        optimizer state along 'data' when cfg.mesh.shard_opt_state (the
        DeepSpeed ZeRO-2 analogue, SURVEY §2.6)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        self.state = self.state.replace(
            step=jax.device_put(self.state.step, replicated),
            params=jax.device_put(self.state.params, replicated),
            batch_stats=jax.device_put(self.state.batch_stats, replicated),
        )
        if self.cfg.mesh.shard_opt_state:
            specs = pmesh.shard_params_zero(self.mesh, self.state.opt_state)
            self.state = self.state.replace(
                opt_state=jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, s)
                    if hasattr(x, "shape") else x,
                    self.state.opt_state, specs,
                    is_leaf=lambda x: hasattr(x, "shape"),
                )
            )
        else:
            self.state = self.state.replace(
                opt_state=jax.device_put(self.state.opt_state, replicated)
            )

    # -- checkpoint ------------------------------------------------------
    def _try_resume(self):
        # abstract state carries each leaf's mesh sharding (set by
        # _apply_shardings) so orbax places restored arrays directly into
        # the sharded layout — no host-replicated detour
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x,
            self.state,
        )
        restored = self.ckpt.restore_latest(abstract)
        if restored is not None:
            epoch, state = restored
            self.state = state
            self.start_epoch = epoch + 1
            logger.info("resumed from checkpoint at epoch %d", epoch)

    # -- loops -----------------------------------------------------------
    def run_epoch(self, epoch: int) -> Dict[str, float]:
        from .optim import lr_multiplier, set_lr_mult

        mult = lr_multiplier(epoch, self.cfg.optim)
        self.state = self.state.replace(
            opt_state=set_lr_mult(self.state.opt_state, mult)
        )

        agg: Dict[str, float] = {}
        count = 0
        for it, batch in enumerate(self.train_loader(epoch)):
            batch = pmesh.shard_batch(self.mesh, batch)
            rng = jax_key(self.cfg.train.seed, epoch, it)
            self.timer.start("train_step")
            self.state, metrics = self.step_fn(self.state, batch, rng)
            n = jax.tree_util.tree_leaves(batch)[0].shape[0]
            self.timer.stop("train_step", n)
            count += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        if count:
            agg = {k: v / count for k, v in agg.items()}
        agg["lr_mult"] = mult
        for k, v in agg.items():
            self.writer.add_scalar(f"train/{k}", v, epoch)
        return agg

    def train(self) -> Dict[str, float]:
        last = {}
        for epoch in range(self.start_epoch, self.cfg.train.max_epochs):
            t0 = time.time()
            last = self.run_epoch(epoch)
            score = None
            if (
                self.eval_loader is not None
                and hasattr(self.task, "eval_fn")
                and (epoch + 1) % self.cfg.train.eval_every_epochs == 0
            ):
                score, eval_metrics = self.task.eval_fn(
                    self.state, self.eval_loader(epoch)
                )
                for k, v in eval_metrics.items():
                    self.writer.add_scalar(f"eval/{k}", v, epoch)
                if score > self.best_result:
                    self.best_result = score
            if (
                (epoch + 1) % self.cfg.train.save_every_epochs == 0
                or epoch == self.cfg.train.max_epochs - 1
                or score is not None
            ):
                self.ckpt.save(
                    epoch, self.state, score=score,
                    metrics={
                        "best_result": self.best_result,
                        # checkpoint-carried config contract
                        # (core/contract.py): eval/infer CLIs assert it
                        "contract": getattr(self.task, "contract", {}),
                    },
                )
            logger.info(
                "epoch %d done in %.1fs: %s", epoch, time.time() - t0, last
            )
        self.ckpt.wait()
        return last
