"""Orbax checkpointing of full training/sampling state.

Replaces the reference's `torch.save(state_dict)` snapshots
(`/root/reference/src/utils/trainer.py:57-63`, which keep weights only —
no optimizer state, no mid-epoch resume) with orbax checkpoints of the
entire `TrainState` pytree (params, EMA shadow + count, Adam moments, step),
enabling exact resume (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: Any, step: int):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, template: Any = None, step: Optional[int] = None):
        """Restore a checkpoint.  With `template=None` arrays come back as
        host numpy regardless of the devices present at save time (a
        TPU-saved checkpoint restores on CPU and vice versa); with a
        template, orbax's standard sharded restore is used."""
        import numpy as np
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        import jax

        path = os.path.join(self.directory, str(step), "default")
        ck = ocp.PyTreeCheckpointer()
        tree = ck.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda m: ocp.type_handlers.RestoreArgs(restore_type=np.ndarray),
            tree, is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"))
        return ck.restore(path, restore_args=restore_args)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
