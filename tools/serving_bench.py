#!/usr/bin/env python
"""Sustained serving throughput for the batched inference path (config #5).

VERDICT r2 Weak #5: PARITY.md had a single-request latency datapoint
(173 ms / 5-person request, upload-bound through the axon tunnel) but no
sustained-throughput number for the "batched inference server path". This
tool measures both:

  1. request latency — one synchronous 5-person ``PoseServer.predict``
     (raw frames + bboxes -> native C++ warp -> device forward [flip-test
     one 2B dispatch] -> host warp-back), matching the committed number;
  2. sustained img/s — a steady stream of pre-cropped patches through
     ``PoseServer.submit_patches``: host preprocessing (uint8 staging)
     of chunk i+1 overlaps the device forward of chunk i because submits
     are async; ONE scalar pull at the end forces the whole chain (the
     tunnel's block_until_ready lies — CLAUDE.md).

Caveats stated in the output: this host has 1 CPU core, so the host-side
warp leg is a serial lower bound (>=3 real cores overlap it fully), and
upload bandwidth through the tunnel is charged to the measurement.

    PYTHONUNBUFFERED=1 python tools/serving_bench.py > /tmp/serving.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    import jax
    import jax.numpy as jnp

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image
    from ihpr_tpu.engine.server import PoseServer
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.parallel import create_train_state

    cfg = get_config("h36m3d_r50")  # production bf16 serving config
    skel = skeletons.get_skeleton(cfg.data.testset)
    model = build_pose_net(cfg, skel.joint_num)
    state, _ = create_train_state(model, cfg, jax.random.key(0), steps_per_epoch=1)
    max_batch = 32
    server = PoseServer(
        cfg, state.params, state.batch_stats, max_batch=max_batch, flip_test=True
    )
    in_h, in_w = cfg.data.input_shape

    # --- 1. single-request latency (5 people in one 640x480 frame) -------
    samples = make_synthetic(skel, 5, seed=77, img_size=480)
    frames = [render_synthetic_image(s) for s in samples]
    bboxes = np.stack([s["bbox"] for s in samples])
    server.predict(frames, bboxes)  # warmup/compile (max_batch-padded fwd)
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = server.predict(frames, bboxes)
        # predict syncs internally (np.asarray per chunk)
        lat.append(time.perf_counter() - t0)
        assert len(res) == 5
    lat_ms = 1e3 * float(np.median(lat))
    print(f"request latency (5-person, flip-test): {lat_ms:.1f} ms")

    # --- 2. sustained throughput: streamed pre-cropped patches -----------
    rng = np.random.RandomState(0)
    n_chunks = 24
    patches = rng.randint(
        0, 255, (max_batch, in_h, in_w, 3), np.uint8
    )  # content is irrelevant to throughput; shape/dtype match production
    server.submit_patches(patches)  # warmup (already compiled at max_batch)

    handles = []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        # Host staging work per chunk (copy ~= what a zero-decode
        # preprocessor leaves); submit is async so the device overlaps it.
        chunk = patches.copy()
        handles.append(server.submit_patches(chunk))
    total = float(jnp.stack([h.sum() for h in handles]).sum())  # ONE pull
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    n_imgs = n_chunks * max_batch
    sustained = n_imgs / dt
    print(
        f"sustained serving: {n_imgs} imgs in {dt:.3f} s = "
        f"{sustained:.1f} img/s (flip-test on => 2x forward work/img)"
    )

    # --- 2b. CHIP-SIDE sustained throughput (transport-independent) ------
    # VERDICT r3 task 5: the phases above charge the tunnel's upload leg
    # to the measurement (content-sensitive, ~100-300 img/s). For the
    # device-side figure, pre-stage ONE patch chunk on device and chain
    # the server's exact jitted program (same flip-test 2B dispatch) so
    # each dispatch consumes the previous result — the bench.py
    # methodology: nothing returns to the host until one final pull.
    dev_patches = jnp.asarray(patches)
    dev_ones = jnp.ones((max_batch, 3), np.float32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(4,))
    def chained(params, bstats, patch_u8, ones, prev):
        # Data dependence on the previous coords (adds exact-zero to the
        # color scale) forces sequential execution through the chain.
        eps = jnp.sum(prev[:1, :1, :1]) * 0.0
        return server._forward(params, bstats, patch_u8, ones + eps)

    prev = chained(
        server.params, server.batch_stats, dev_patches, dev_ones,
        jnp.zeros((max_batch, skel.joint_num, 3), np.float32),
    )
    _ = np.asarray(prev)  # compile + settle
    chain_iters = 50
    t0 = time.perf_counter()
    for _ in range(chain_iters):
        prev = chained(
            server.params, server.batch_stats, dev_patches, dev_ones, prev
        )
    _ = float(prev.sum())  # ONE pull forces the chain
    dt = time.perf_counter() - t0
    chip_side = chain_iters * max_batch / dt
    print(
        f"chip-side sustained (device-resident patches, chained): "
        f"{chip_side:.1f} img/s (flip-test on => 2x forward work/img)"
    )

    # --- 3. same stream including the native warp preprocessing ----------
    from ihpr_tpu.data import native

    warp_row = None
    if native.available():
        src = [f for f in frames] * ((max_batch + 4) // 5)
        src = src[:max_batch]
        invs = np.tile(np.eye(2, 3, dtype=np.float32), (max_batch, 1, 1))
        native.warp_batch(src, invs, np.zeros(max_batch, np.int32), in_h, in_w)
        handles = []
        t0 = time.perf_counter()
        for i in range(n_chunks):
            warped = native.warp_batch(
                src, invs, np.zeros(max_batch, np.int32), in_h, in_w
            )
            handles.append(server.submit_patches(warped))
        total = float(jnp.stack([h.sum() for h in handles]).sum())
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        warp_row = n_imgs / dt
        print(
            f"sustained incl. native warp (1 host core): {warp_row:.1f} img/s"
        )

        # --- 3a. control: SAME rendered content, NO per-chunk warp -------
        # (round-3 advisor): phases 2 vs 3 differ in patch content AND
        # per-chunk host work, so neither isolates the tunnel's content
        # sensitivity. This phase streams the identical rendered patches
        # with only the phase-2 .copy() per chunk — the (2 vs 3a) delta is
        # pure content, the (3a vs 3) delta is pure warp cost.
        warped0 = native.warp_batch(
            src, invs, np.zeros(max_batch, np.int32), in_h, in_w
        )
        handles = []
        t0 = time.perf_counter()
        for i in range(n_chunks):
            chunk = warped0.copy()
            handles.append(server.submit_patches(chunk))
        total = float(jnp.stack([h.sum() for h in handles]).sum())
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        content_row = n_imgs / dt
        print(
            f"sustained rendered content, no per-chunk warp (control): "
            f"{content_row:.1f} img/s"
        )

    # --- 3b. exported StableHLO artifact vs the live server --------------
    # The artifact runs the plain-XLA soft-argmax composition (portable;
    # no Mosaic custom call). Price that substitution at serving batch
    # sizes — the PARITY datapoint behind engine/export.py's claim that
    # the live server stays the max-throughput path.
    artifact_row = None
    try:
        from ihpr_tpu.engine.export import export_server, load_exported

        fn = load_exported(export_server(server, batch=max_batch))
        ones = np.ones((max_batch, 3), np.float32)
        _ = fn(patches, ones)  # warmup/compile
        handles = []
        t0 = time.perf_counter()
        for i in range(n_chunks):
            chunk = patches.copy()
            handles.append(fn(chunk, ones))
        total = float(jnp.stack([h.sum() for h in handles]).sum())
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        artifact_row = n_imgs / dt
        print(
            f"sustained via exported artifact (plain-XLA composition): "
            f"{artifact_row:.1f} img/s (live fused path: {sustained:.1f})"
        )

        # --- 3c. CHIP-SIDE artifact cost (per-link-pull methodology) ------
        # VERDICT r4 Weak #3: the 3b figure conflates the plain-composition
        # + no-donation cost with tunnel transport. The 2b chained harness
        # does NOT transfer to the deserialized artifact: dispatching an
        # outer-jit program that inlines an ``Exported.call`` with an
        # UNSETTLED device future as an argument costs ~1 s/link on the
        # axon tunnel regardless of donation (probe ledger, PARITY.md),
        # while the transport-fed 3b stream bounds the true device time at
        # <~366 ms/chunk — so a chained 3c number would be a client
        # pathology, not compute. The strictest trustworthy timing here is
        # a PER-LINK synchronous pull (each dispatch forced to full
        # completion before the next). That charges one tunnel round trip
        # per link to both sides, so run the LIVE program under the same
        # harness and remove the common RTT using 2b's RTT-free chained
        # figure:  exec_art ~= perlink_art - (perlink_live - chained_live).
        def per_link_pull_ms(f, *fargs, iters=10):
            _ = float(f(*fargs).sum())  # settle
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = float(f(*fargs).sum())
            return (time.perf_counter() - t0) / iters * 1e3

        live_jit = jax.jit(server._forward)
        perlink_art = per_link_pull_ms(fn, dev_patches, dev_ones)
        perlink_live = per_link_pull_ms(
            live_jit, server.params, server.batch_stats, dev_patches, dev_ones
        )
        chained_live_ms = 1e3 * max_batch / chip_side  # from 2b
        rtt_ms = max(0.0, perlink_live - chained_live_ms)
        exec_art_ms = max(chained_live_ms, perlink_art - rtt_ms)

        # Corroborating chain (N=32, fresh settled start). In a healthy
        # client state this asymptotes to the same exec number (probe4
        # sweep: 25.7 -> 16.5 ms/link for N=3 -> 32, = exec + RTT/N); in
        # the degraded state it reads ~1 s/link, in which case the
        # per-link-pull figure above stands alone.
        @jax.jit  # glue INSIDE the program: eager glue on fed-back outputs
        def chained_art(patch_u8, ones, prev):  # is itself a pathology trigger
            eps = jnp.sum(prev[:1, :1, :1]) * 0.0
            return fn(patch_u8, ones + eps)

        prev_a = fn(dev_patches, dev_ones)
        _ = np.asarray(prev_a)
        _ = np.asarray(chained_art(dev_patches, dev_ones, prev_a))  # compile
        n_chain = 32
        t0 = time.perf_counter()
        for _ in range(n_chain):
            prev_a = chained_art(dev_patches, dev_ones, prev_a)
        _ = float(prev_a.sum())
        chain_art_ms = (time.perf_counter() - t0) / n_chain * 1e3
        if chain_art_ms < perlink_art:  # healthy: prefer the chained figure
            exec_art_ms = chain_art_ms - rtt_ms / n_chain
        artifact_chip = 1e3 * max_batch / exec_art_ms
        print(
            f"chip-side artifact: per-link pull {perlink_art:.1f} ms raw, "
            f"live same-harness {perlink_live:.1f} ms "
            f"(chained {chained_live_ms:.1f} => tunnel RTT ~{rtt_ms:.1f}); "
            f"chained x{n_chain} {chain_art_ms:.1f} ms/link; "
            f"artifact exec {exec_art_ms:.1f} ms = {artifact_chip:.1f} img/s "
            f"(live fused chip-side: {chip_side:.1f})"
        )
    except Exception as e:  # keep the queue going; artifact is optional
        artifact_chip = None
        perlink_art = perlink_live = None
        print(f"artifact phase FAILED: {type(e).__name__}: {e}")

    # --- 4. pipelined full-path requests (PoseServer.predict_stream) -----
    n_req = 16
    stream_reqs = [(frames, bboxes)] * n_req
    list(server.predict_stream([(frames, bboxes)]))  # warm
    t0 = time.perf_counter()
    res = list(server.predict_stream(stream_reqs))
    dt = time.perf_counter() - t0
    assert len(res) == n_req and len(res[-1]) == 5
    stream_rps = n_req / dt
    print(
        f"pipelined full-path: {n_req} x 5-person requests in {dt:.3f} s = "
        f"{stream_rps:.1f} req/s ({1e3 * dt / n_req:.1f} ms/req effective "
        f"vs {lat_ms:.1f} ms sequential)"
    )

    out = {
        "request_latency_ms": round(lat_ms, 1),
        "pipelined_req_per_s": round(stream_rps, 2),
        "sustained_img_per_s": round(sustained, 1),
        "chip_side_sustained_img_per_s": round(chip_side, 1),
        "sustained_incl_warp_img_per_s": (
            None if warp_row is None else round(warp_row, 1)
        ),
        "sustained_rendered_no_warp_img_per_s": (
            None if warp_row is None else round(content_row, 1)
        ),
        "sustained_artifact_img_per_s": (
            None if artifact_row is None else round(artifact_row, 1)
        ),
        "chip_side_artifact_img_per_s": (
            None if artifact_chip is None else round(artifact_chip, 1)
        ),
        "artifact_per_link_pull_ms": (
            None if perlink_art is None else round(perlink_art, 1)
        ),
        "live_per_link_pull_ms": (
            None if perlink_live is None else round(perlink_live, 1)
        ),
        "max_batch": max_batch,
        "flip_test": True,
        "chunks": n_chunks,
        "host_cores": os.cpu_count(),
    }
    print(json.dumps(out))
    with open("/tmp/serving_bench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
