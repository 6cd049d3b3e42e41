"""Orbax-backed checkpointing with the reference's retention semantics.

Replaces the reference's torch.save dicts + filename-regex latest-checkpoint
discovery + broadcast (train_video_segment_ddp.py:151-207) and the
keep-last-10 + best tracking of train_chapter_title_gen.py:77-110 with an
orbax CheckpointManager: async save of one train-state pytree with
{epoch, best_result} metadata, automatic retention, best-checkpoint
tracking, and resume-latest.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 10,
        best_mode: str = "max",
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("score", float("-inf")),
                best_mode=best_mode,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, epoch: int, state: Any, score: Optional[float] = None,
             metrics: Optional[Dict] = None) -> None:
        m = dict(metrics or {})
        if score is not None:
            m["score"] = float(score)
        self.manager.save(
            epoch, args=self._ocp.args.StandardSave(state), metrics=m
        )

    def restore_latest(self, abstract_state: Any) -> Optional[tuple]:
        """Returns (epoch, state) of the newest checkpoint, or None."""
        step = self.manager.latest_step()
        if step is None:
            return None
        state = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )
        return step, state

    def restore_best(self, abstract_state: Any) -> Optional[tuple]:
        step = self.manager.best_step()
        if step is None:
            return None
        state = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )
        return step, state

    def restore_raw(self, step: Optional[int] = None) -> Optional[tuple]:
        """Restore a checkpoint WITHOUT an abstract target: returns
        (step, tree) with the saved structure (TrainState fields as a
        dict). Used for stream warm-starts across model kinds
        (train_segment --init_streams — the reference's
        lang/vision_pretrain_ckpt_path surface)."""
        step = self.manager.latest_step() if step is None else step
        if step is None:
            return None
        return step, self.manager.restore(step)

    def metrics_for(self, step: int) -> Dict:
        """Per-step metrics metadata (incl. the train-config contract,
        core/contract.py) saved alongside the state."""
        try:
            return dict(self.manager.metrics(step) or {})
        except Exception:
            return {}

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
