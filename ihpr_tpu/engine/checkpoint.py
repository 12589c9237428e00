"""Epoch-granular checkpoint save/restore via Orbax.

Reference: ``common/base.py:save_model/load_model`` — per-epoch
``snapshot_{e}.pth.tar`` holding {epoch, network, optimizer} state dicts,
``--continue`` resumes from the highest epoch found. Same semantics here:
``output_dir/model_dump/snapshot_{e}`` holding the full TrainState + the
data RNG key, so resume reproduces the exact training stream.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, keep: Optional[int] = None):
        """``keep``: retain only the newest N snapshots on disk (None =
        keep every epoch, the reference's behavior)."""
        if keep is not None and keep < 1:
            # keep=0 would make _prune's [:-keep or None] slice delete EVERY
            # snapshot (silent total checkpoint loss); reject it up front.
            raise ValueError(f"snapshot keep must be >= 1 or None, got {keep}")
        self.dump_dir = os.path.abspath(os.path.join(output_dir, "model_dump"))
        self.keep = keep
        os.makedirs(self.dump_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _epochs_on_disk(self):
        return sorted(
            int(m.group(1))
            for name in os.listdir(self.dump_dir)
            if (m := re.fullmatch(r"snapshot_(\d+)", name))
            and os.path.isdir(os.path.join(self.dump_dir, name))
        )

    def _path(self, epoch: int) -> str:
        return os.path.join(self.dump_dir, f"snapshot_{epoch}")

    def save(self, epoch: int, state: Any, rng: jax.Array, itr: int = -1):
        """Asynchronous: serialization happens in the background (a full
        snapshot takes ~70s of host IO on a 1-core host — blocking per epoch
        would dwarf the step time). The previous save is drained first;
        call ``wait()`` before process exit.

        Multi-host: EVERY process must call this — orbax's
        ``AsyncCheckpointer.save`` opens with a
        ``sync_global_processes('Checkpointer:save_start')`` barrier, so
        a process-0-only guard here would leave process 0 blocked at the
        barrier forever (measured: the 2-process save in
        tools/multiprocess_dp.py). Orbax itself writes the payload bytes
        on the primary host only, which is what makes concurrent-writer
        corruption impossible; the host-side ``_prune`` stays
        process-0-gated. Resume under --multihost expects ``output_dir``
        on a filesystem all hosts can read (every process restores from
        the same path).

        ``itr``: last COMPLETED iteration within ``epoch`` for a mid-epoch
        snapshot (the step-granular RSS watchdog's self-preempt); -1 (the
        default) means the epoch finished. Resume skips the first itr+1
        batches of that epoch's deterministic stream, so the continued run
        is bit-identical either way."""
        self._ckpt.wait_until_finished()  # at most one save in flight
        # Prune BEFORE starting the new async write, and only down to
        # ``keep`` — never keep-1: that would leave a window with zero
        # restorable snapshots if the process dies mid-write (the
        # in-flight Orbax tmp dir does not match snapshot_\\d+). Disk
        # transiently holds keep+1; wait() prunes to exactly keep.
        self._prune(self.keep)
        payload = {
            "state": jax.device_get(state),
            "rng": np.asarray(jax.random.key_data(rng)),
            "epoch": np.asarray(epoch, np.int32),
            "itr": np.asarray(itr, np.int32),
        }
        self._ckpt.save(self._path(epoch), payload, force=True)

    def _prune(self, keep: Optional[int]):
        """Remove all but the newest ``keep`` fully-written snapshots.
        Call only after a drain (every dir on disk is then complete).
        Process 0 only, like ``save`` (shared-filesystem safety)."""
        if keep is None or jax.process_index() != 0:
            return
        import shutil

        for e in self._epochs_on_disk()[: -keep or None]:
            shutil.rmtree(self._path(e), ignore_errors=True)

    def wait(self):
        self._ckpt.wait_until_finished()
        self._prune(self.keep)

    def latest_epoch(self) -> Optional[int]:
        self._ckpt.wait_until_finished()  # make in-flight saves visible
        epochs = self._epochs_on_disk()
        return epochs[-1] if epochs else None

    def load(
        self, epoch: int, template: Any, rng_template: jax.Array
    ) -> Tuple[Any, jax.Array, int, int]:
        """-> (state, rng, epoch, itr). itr = -1 for an end-of-epoch
        snapshot (including every pre-round-5 snapshot, which carried no
        itr field — restored via the legacy template)."""
        self._ckpt.wait_until_finished()
        base = {
            "state": jax.device_get(template),
            "rng": np.asarray(jax.random.key_data(rng_template)),
            "epoch": np.asarray(0, np.int32),
        }
        try:
            payload = self._ckpt.restore(
                self._path(epoch), base | {"itr": np.asarray(-1, np.int32)}
            )
            itr = int(payload["itr"])
        except (ValueError, KeyError):
            payload = self._ckpt.restore(self._path(epoch), base)
            itr = -1
        rng = jax.random.wrap_key_data(payload["rng"])
        return payload["state"], rng, int(payload["epoch"]), itr

    def load_latest(self, template: Any, rng_template: jax.Array):
        """Reference ``--continue``: resume from the highest snapshot."""
        epoch = self.latest_epoch()
        if epoch is None:
            return None
        return self.load(epoch, template, rng_template)
