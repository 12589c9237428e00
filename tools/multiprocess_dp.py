#!/usr/bin/env python
"""REAL multi-process data-parallel validation (the DCN path, no cluster).

The unit tests mock ``jax.process_count``; this tool actually runs TWO
JAX processes on localhost (``jax.distributed.initialize`` + 4 virtual
CPU devices each = 8 global devices) and executes ONE production train
step through the full multi-host input path:

  BatchLoader._batch_selection      per-process contiguous row blocks
  prefetch_to_device                jax.make_array_from_process_local_data
  make_train_step                   pjit over the 8-device global mesh,
                                    cross-process gradient all-reduce

Pass criteria (checked by the parent):
  1. both workers report the SAME finite loss (replicated output), and
  2. that loss equals a single-process 8-device run of the same global
     batch to 1e-6 (the multi-host input assembly is exactly equivalent).

Usage:  python tools/multiprocess_dp.py            # parent, ~5 min on CPU
        (workers are spawned internally with --worker N)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "127.0.0.1:29871"
NPROC = 2
LOCAL_DEVICES = 4


def build_and_step(n_global_devices: int):
    """Tiny-but-real config; returns the loss of one production step."""
    import jax
    import numpy as np

    from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.parallel import (
        batch_sharding,
        create_train_state,
        make_mesh,
        make_train_step,
    )

    cfg = get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("Human36M",),
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=16,
            use_aug=False,  # keep the global batch bit-identical across
            # process splits (per-sample aug draws depend on local order)
        ),
        optim=OptimConfig(batch_size_per_device=2),
    )
    skel = skeletons.H36M
    ds = PoseDataset(
        "Human36M",
        skel,
        make_synthetic(skel, 4 * n_global_devices, seed=0, img_size=128),
        True,
    )
    mesh = make_mesh(n_global_devices)
    global_batch = cfg.optim.batch_size_per_device * n_global_devices
    loader = BatchLoader([ds], cfg, global_batch, train=True, num_workers=0)
    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), len(loader), mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=False)
    batch, _ = next(iter(prefetch_to_device(loader.epoch(0), batch_sharding(mesh))))
    _, metrics = step(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    return loss


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=pid
    )
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES, jax.devices()
    loss = build_and_step(NPROC * LOCAL_DEVICES)
    print(f"WORKER {pid} loss={loss:.8f}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers set cpu themselves
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(p)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for p in range(NPROC)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    losses = {}
    for p, out in zip(procs, outs):
        m = re.search(r"WORKER (\d+) loss=([\d.eE+-]+)", out)
        if p.returncode != 0 or not m:
            tail = "\n".join(out.strip().splitlines()[-15:])
            raise SystemExit(f"worker failed (rc={p.returncode}):\n{tail}")
        losses[int(m.group(1))] = float(m.group(2))
    print(f"worker losses: {losses}")
    assert abs(losses[0] - losses[1]) < 1e-9, losses

    # Single-process 8-device reference on the same global batch.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={NPROC * LOCAL_DEVICES}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    ref = build_and_step(NPROC * LOCAL_DEVICES)
    print(f"single-process reference loss={ref:.8f}")
    assert abs(losses[0] - ref) < 1e-6, (losses[0], ref)
    print("multiprocess_dp: PASS (2-process DCN input path == single-process)")


if __name__ == "__main__":
    main()
