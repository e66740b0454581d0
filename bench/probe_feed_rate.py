"""Host input-feed rate accounting (SURVEY §7 "keeping 8 chips fed at
b16 384x1152 means decode is the bottleneck").

Measures, on THIS host:
  1. native C++ PNG decode fps (single thread — this box has 1 core)
     for a KITTI-sized 384x1152 RGB frame, vs the PIL fallback;
  2. ThreadPoolExecutor scaling (expected flat on 1 core: the native
     decoder releases the GIL, but there is no second core to run on);
  3. PipelinedFeed staging rate for pre-decoded uint8 batches (decode
     excluded — isolates the device_put/tunnel path).

Prints the cores-needed arithmetic for a v5e-8 config-5 deployment so
BASELINE.md can record an honest feed-scaling note instead of an
unmeasured "pipelined feed keeps the chips fed" claim.

Usage: python -u bench/probe_feed_rate.py [n_frames] [batch]
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from scenedepthestimation_tpu.data import io as dio


def make_frames(tmp: pathlib.Path, n: int, hw=(384, 1152)) -> list:
    """Write n distinct photo-like PNGs (smooth gradients + noise —
    compresses like a real photo, not like synthetic flat color)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w]
    paths = []
    for i in range(n):
        base = (
            96
            + 64 * np.sin(xx / (40 + i) + i)
            + 48 * np.cos(yy / (30 + i))
        )
        img = np.clip(
            base[..., None] + rng.normal(0, 12, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        p = tmp / f"f{i:03d}.png"
        Image.fromarray(img).save(p, optimize=False)
        paths.append(str(p))
    return paths


def time_decode(paths, fn, label, repeats=3):
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in paths:
            fn(p)
        best.append(time.perf_counter() - t0)
    dt = sorted(best)[1]
    fps = len(paths) / dt
    print(f"  {label}: {fps:8.1f} frames/sec ({1e3 * dt / len(paths):.2f} ms/frame)")
    return fps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import os

    print(f"host cores: {os.cpu_count()}")
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        paths = make_frames(tmp, n)
        sz = sum(pathlib.Path(p).stat().st_size for p in paths) / n
        print(f"frames: {n} x 384x1152 RGB PNG, mean {sz / 1e3:.0f} kB")

        print("-- decode (single thread) --")
        fps_native = time_decode(paths, dio.load_image, "native C++   ")
        dio._FORCE_PIL = True
        fps_pil = time_decode(paths, dio.load_image, "PIL fallback ")
        dio._FORCE_PIL = False

        print("-- decode (thread pool, GIL-released native) --")
        for workers in (2, 4):
            best = []
            for _ in range(3):
                with cf.ThreadPoolExecutor(workers) as ex:
                    t0 = time.perf_counter()
                    list(ex.map(dio.load_image, paths))
                    best.append(time.perf_counter() - t0)
            fps = n / sorted(best)[1]
            print(f"  {workers} workers: {fps:8.1f} frames/sec")

        print("-- staging (PipelinedFeed, pre-decoded uint8, decode excluded) --")
        import jax

        from scenedepthestimation_tpu.parallel.feed import PipelinedFeed

        rng = np.random.default_rng(0)
        batches = [
            rng.integers(0, 256, size=(b, 384, 1152, 3), dtype=np.uint8)
            for _ in range(6)
        ]
        feed = PipelinedFeed(iter(batches), depth=2)
        got = []
        t0 = time.perf_counter()
        for dev_batch in feed:
            jax.block_until_ready(dev_batch)
            got.append(dev_batch)
        dt = time.perf_counter() - t0
        frames = b * len(got)
        mb = frames * 384 * 1152 * 3 / 1e6
        print(
            f"  staged {frames} frames ({mb:.0f} MB) in {dt:.2f} s -> "
            f"{frames / dt:7.1f} frames/sec, {mb / dt:6.1f} MB/s"
        )

        print("-- v5e-8 config-5 accounting --")
        need = 8 * 896.0
        print(f"  global demand at 896 fps/chip x 8 chips: {need:.0f} frames/sec")
        print(
            f"  decode cores needed (native, {fps_native:.0f} fps/core): "
            f"{need / fps_native:.1f}"
        )
        print(
            f"  PCIe staging demand: {need * 384 * 1152 * 3 / 1e9:.1f} GB/s uint8 "
            f"(a v5e host's PCIe gen3+ x16 sustains ~12-16 GB/s)"
        )


if __name__ == "__main__":
    main()
