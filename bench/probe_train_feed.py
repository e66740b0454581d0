"""End-to-end training-from-files throughput (VERDICT r4 weak-#1: the
training input feed was synchronous and unmeasured — no `scenedepth
train` run from actual image files had a feed-rate story).

Measures, same-session on the real chip, mono-supervised 192x640:

  1. DEVICE BOUND — the jitted train step on a fixed on-device batch
     (what BASELINE.md's train table reports);
  2. FEED-ONLY rate — the mono_train_batches host path (PNG decode +
     velodyne GT projection + crop + stack) over a synthetic KITTI tree
     at raw resolution (375x1242, photo-like PNGs, ~15k lidar points),
     for workers in {0, 2};
  3. E2E — the Trainer-equivalent loop: batches → transfer → step, in
     the synchronous form (feed_depth=0) vs the pipelined form
     (PipelinedFeed depth=2, decode workers=2).

The expected structure on this 1-core host: decode runs in the
producer thread with the GIL released (native decoder), the device
step runs on the TPU — so the pipelined e2e should approach
min(feed, device) while the synchronous form pays the sum
1/(1/feed + 1/device).

Measured (2026-08-20, BASELINE.md round-5 table): device bound 561
fps, feed-only 112.6, e2e sync 46.2, e2e pipelined w2/d2 **63.0**
(1.36x) — pipelining wins but does not reach the feed bound on 1
core; the residual is GIL time the crop/stack/device_put path spends
between decodes. TIMING RULE: every wait here is a VALUE fetch
(float(loss)) — through the axon tunnel, block_until_ready returns
before execution completes and produced a 12,810-fps "device bound"
and a 81.7-fps "sync e2e" that were pure enqueue-rate artifacts.

Usage: python -u bench/probe_train_feed.py [n_frames] [batch] [steps]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def make_kitti_tree(root: pathlib.Path, n: int, hw=(375, 1242), pts=15000):
    """Synthetic KITTI-raw tree at real raw resolution: photo-like PNGs
    (gradients + noise — compresses/decodes like a camera frame) +
    velodyne scans with a realistic point count for honest GT-projection
    cost."""
    from PIL import Image

    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(0)
    h, w = hw
    os.makedirs(root / "2011_09_26", exist_ok=True)
    r = np.eye(3).reshape(-1)
    p2 = [721.5, 0, w / 2, 0, 0, 721.5, h / 2, 0, 0, 0, 1, 0]
    p3 = list(p2)
    p3[3] = -387.5
    (root / "2011_09_26" / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: " + " ".join(map(str, r)) + "\n"
        "P_rect_02: " + " ".join(map(str, p2)) + "\n"
        "P_rect_03: " + " ".join(map(str, p3)) + "\n"
    )
    rv = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    (root / "2011_09_26" / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, rv.reshape(-1))) + "\nT: 0 0 0\n"
    )
    yy, xx = np.mgrid[0:h, 0:w]
    d = root / drive / "image_02" / "data"
    vd = root / drive / "velodyne_points" / "data"
    os.makedirs(d, exist_ok=True)
    os.makedirs(vd, exist_ok=True)
    lines = []
    for i in range(n):
        base = 96 + 64 * np.sin(xx / (40 + i) + i) + 48 * np.cos(yy / (30 + i))
        img = np.clip(
            base[..., None] + rng.normal(0, 18, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        Image.fromarray(img).save(d / f"{i:010d}.png")
        scan = np.stack(
            [
                rng.uniform(2, 60, pts),   # forward (depth)
                rng.uniform(-20, 20, pts),  # left
                rng.uniform(-2, 3, pts),    # up
                np.ones(pts),
            ],
            1,
        ).astype(np.float32)
        scan.tofile(vd / f"{i:010d}.bin")
        lines.append(f"{drive} {i} l")
    os.makedirs(root / "splits" / "eigen", exist_ok=True)
    (root / "splits" / "eigen" / "train_files.txt").write_text(
        "\n".join(lines) + "\n"
    )
    return str(root)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 18

    import jax

    from scenedepthestimation_tpu import configs, train
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset
    from scenedepthestimation_tpu.data.train_feed import mono_train_batches
    from scenedepthestimation_tpu.parallel.feed import (
        PipelinedFeed,
        train_batch_transfer,
    )

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="trainfeed_"))
    t0 = time.perf_counter()
    root = make_kitti_tree(tmp / "kitti", n_frames)
    print(
        json.dumps(
            {"tree": root, "frames": n_frames,
             "gen_s": round(time.perf_counter() - t0, 1)}
        ),
        flush=True,
    )

    cfg = configs.get("mono_kitti_192x640_fp32")
    import dataclasses

    cfg = dataclasses.replace(cfg, batch_size=batch)
    net_hw = (cfg.mono.height, cfg.mono.width)

    # The step DONATES the TrainState, so every measurement needs a
    # fresh one (reusing a donated state raises InvalidArgument).
    def fresh_state():
        return train.make_train_state(cfg, seed=0)

    step = train.make_mono_train_step(cfg)
    ds = KittiRawDataset(
        root=root,
        split_file=os.path.join(root, "splits", "eigen", "train_files.txt"),
        gt="velodyne",
    )

    def fresh_batches(workers):
        return mono_train_batches(
            ds, net_hw, batch, min_depth=cfg.mono.min_depth,
            max_depth=cfg.mono.max_depth, seed=0, workers=workers,
        )

    # --- 1. device bound: fixed on-device batch -------------------------
    one = next(fresh_batches(0))
    dev_batch = {k: jax.device_put(v) for k, v in one.items()}
    s = fresh_state()
    for _ in range(3):
        s, m = step(s, dev_batch)
    float(m["loss"])  # VALUE fetch: the tunnel makes block_until_ready unreliable (measurement-lessons)
    t0 = time.perf_counter()
    for _ in range(steps):
        s, m = step(s, dev_batch)
    float(m["loss"])  # VALUE fetch: the tunnel makes block_until_ready unreliable (measurement-lessons)
    dev_fps = steps * batch / (time.perf_counter() - t0)
    print(json.dumps({"device_bound_fps": round(dev_fps, 1)}), flush=True)

    # --- 2. feed-only rate ---------------------------------------------
    for workers in (0, 2):
        it = fresh_batches(workers)
        next(it)  # warm caches/imports
        t0 = time.perf_counter()
        got = 0
        for b in it:
            got += 1
            if got >= steps:
                break
        fps = got * batch / (time.perf_counter() - t0)
        print(
            json.dumps({"feed_only_workers": workers, "fps": round(fps, 1)}),
            flush=True,
        )

    # --- 3. e2e: synchronous vs pipelined ------------------------------
    transfer = train_batch_transfer(None, batch)

    def run_e2e(label, batches_iter):
        s = fresh_state()
        it = iter(batches_iter)
        b0 = next(it)  # first batch + compile already warm
        s, m = step(s, b0)
        float(m["loss"])  # VALUE fetch: the tunnel makes block_until_ready unreliable (measurement-lessons)
        t0 = time.perf_counter()
        done = 0
        for b in it:
            s, m = step(s, b)
            done += 1
            if done >= steps:
                break
        float(m["loss"])  # VALUE fetch: the tunnel makes block_until_ready unreliable (measurement-lessons)
        fps = done * batch / (time.perf_counter() - t0)
        if hasattr(it, "close"):
            it.close()  # stop the producer thread before the next run
        print(json.dumps({label: round(fps, 1)}), flush=True)
        return fps

    results = {}
    results["sync_w0"] = run_e2e(
        "e2e_sync_w0_fps", map(transfer, fresh_batches(0))
    )
    for workers, depth in ((0, 1), (0, 2), (2, 2)):
        results[f"pipe_w{workers}_d{depth}"] = run_e2e(
            f"e2e_pipe_w{workers}_d{depth}_fps",
            PipelinedFeed(fresh_batches(workers), depth=depth, transfer=transfer),
        )
    best = max(results, key=results.get)
    print(
        json.dumps(
            {
                "best": best,
                "best_vs_sync": round(results[best] / results["sync_w0"], 3),
                "best_vs_device_bound": round(results[best] / dev_fps, 3),
                "feed_cores_to_saturate_device": round(
                    dev_fps / max(results.values()), 1
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
