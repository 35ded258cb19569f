"""Orbax checkpointing: async sharded save / rotate / auto-resume.

Replaces the reference's torch.save pickle flow (reference
utils/__init__.py:686-770: `save_model` with XLA->CPU tensor migration,
rank-0-only write, rotation keeping `save_ckpt_num`, `auto_load_model`
globbing `checkpoint-*.pth`). Orbax writes each shard from the host that
owns it (no device->CPU migration step, no rank-0 serialization bottleneck)
and restores directly into the target sharding.
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper with the reference's save/rotate/resume semantics."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_epochs: int = 1):
        self._mngr = ocp.CheckpointManager(
            directory,
            item_names=("state", "metadata"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_epochs,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    @staticmethod
    def _as_dict(state: Any) -> Any:
        """Shallow field-dict view of a (flax struct) dataclass train state.

        Checkpoints are stored dict-structured so they can be restored
        without the custom pytree class (serving hosts, raw inspection) and
        device-agnostically.
        """
        import dataclasses

        if dataclasses.is_dataclass(state):
            return {f.name: getattr(state, f.name)
                    for f in dataclasses.fields(state)}
        return state

    def save(self, epoch: int, state: Any, metadata: Optional[dict] = None):
        """Async save; rotation handled by max_to_keep."""
        composite = {"state": ocp.args.StandardSave(self._as_dict(state))}
        if metadata is not None:
            composite["metadata"] = ocp.args.JsonSave(metadata)
        self._mngr.save(epoch, args=ocp.args.Composite(**composite))

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None):
        """Restore into the template's shardings; returns (state, metadata).

        Parity with auto_load_model: epoch=None restores the latest.
        """
        epoch = epoch if epoch is not None else self._mngr.latest_step()
        if epoch is None:
            return None, None
        restored = self._mngr.restore(
            epoch, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(self._as_dict(state_template))))
        state_dict = restored["state"]
        if type(state_template) is not dict:
            state_dict = type(state_template)(**state_dict)
        meta = None
        try:
            meta = self._mngr.restore(
                epoch, args=ocp.args.Composite(metadata=ocp.args.JsonRestore()))
            meta = meta.get("metadata")
        except Exception:
            pass
        return state_dict, meta

    def restore_raw(self, epoch: Optional[int] = None):
        """Restore as a plain pytree without a live-state template (serving:
        read params/ema without reconstructing the optimizer). Shapes/dtypes
        come from checkpoint metadata; arrays land on the current default
        device (saved device names may not exist on the restoring host)."""
        import jax

        epoch = epoch if epoch is not None else self._mngr.latest_step()
        if epoch is None:
            return None
        import os

        # Direct StandardCheckpointer restore honors template shardings
        # (the manager path re-resolves SAVED device names, which may not
        # exist on the restoring host).
        path = os.path.join(str(self._mngr.directory), str(epoch), "state")
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(path)
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            dict(meta.item_metadata) if hasattr(meta, "item_metadata") else meta)
        return ckptr.restore(path, template)

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


def auto_resume(manager: CheckpointManager, state_template: Any):
    """Resume from the newest checkpoint if one exists (reference
    utils/__init__.py:735-770 semantics: restores model+opt+epoch+ema)."""
    epoch = manager.latest_epoch()
    if epoch is None:
        return None, 0
    state, meta = manager.restore(state_template, epoch)
    start_epoch = (meta or {}).get("epoch", epoch) + 1
    log.info("auto-resumed from epoch %d", epoch)
    return state, start_epoch
