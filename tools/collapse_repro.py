"""Soft-argmin collapse repro + mitigation check (VERDICT r1 next-#5).

Round-1 finding (BASELINE.md): supervised stereo training at lr 3e-4
collapses the soft-argmin head to its uniform-softmax mean (constant
D/2 output) and never escapes; lr 1e-4 reached EPE 3.99 in 3000 steps on
a synthetic banded-disparity set. This script regenerates that setup and
trains at lr 3e-4 with the round-2 mitigations (LR warmup, soft-argmin
temperature, optional refinement + multi-scale supervision), reporting
EPE so BASELINE.md can record whether 3e-4 now converges.

Usage:
  python tools/collapse_repro.py --steps 3000 --lr 3e-4            # repro
  python tools/collapse_repro.py --steps 3000 --lr 3e-4 \
      --warmup-steps 500 --temperature 0.5 [--refine]              # fix
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def make_banded_set(root: str, n: int = 24, hw=(128, 320), max_disp=40, seed=0):
    """Synthetic rectified pairs: smooth random texture, right = left
    shifted by a per-horizontal-band disparity. KITTI-2015 tree layout."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = hw
    for i in range(n):
        # Smooth texture: cumulative sums of noise, normalized to uint8.
        base = np.cumsum(rng.normal(0, 1, (h, w + max_disp, 3)), axis=1)
        base += np.cumsum(rng.normal(0, 1, (h, w + max_disp, 3)), axis=0)
        base = (base - base.min()) / np.ptp(base)
        left = (base[:, max_disp:] * 255).astype(np.uint8)

        n_bands = 4
        band_disp = rng.integers(4, max_disp, size=n_bands)
        disp = np.zeros((h, w), np.float32)
        right = np.zeros_like(left)
        for b in range(n_bands):
            r0, r1 = b * h // n_bands, (b + 1) * h // n_bands
            d = int(band_disp[b])
            disp[r0:r1] = d
            # right pixel (y, x) sees left pixel (y, x + ... ): disparity d
            # means left (y, x) ↔ right (y, x - d).
            right[r0:r1] = (base[r0:r1, max_disp - d : max_disp - d + w] * 255).astype(
                np.uint8
            )

        name = f"{i:06d}_10.png"
        for sub, arr in (
            ("image_2", left),
            ("image_3", right),
        ):
            p = os.path.join(root, "training", sub, name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(arr).save(p)
        p = os.path.join(root, "training", "disp_occ_0", name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray((disp * 256).astype(np.uint16)).save(p)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--refine", action="store_true")
    ap.add_argument(
        "--aux-ce",
        type=float,
        default=0.0,
        help="disparity-classification CE weight (collapse anchor)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data", default=None, help="reuse an existing set")
    ap.add_argument("--log-every", type=int, default=250)
    args = ap.parse_args()

    from scenedepthestimation_tpu import configs, train
    from scenedepthestimation_tpu.configs import StereoConfig
    from scenedepthestimation_tpu.data import train_feed
    from scenedepthestimation_tpu.data.kitti2015 import Kitti2015Dataset, batched
    from scenedepthestimation_tpu.utils import metrics as M

    import jax.numpy as jnp

    tmp = None
    root = args.data
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
        make_banded_set(root)

    stereo = StereoConfig(
        height=128,
        width=320,
        max_disp=64,
        feat_channels=32,
        refine=args.refine,
        softargmin_temperature=args.temperature,
        aux_ce_weight=args.aux_ce,
    )
    cfg = dataclasses.replace(
        configs.get("stereo_256x512_b4"),
        name="collapse_repro",
        batch_size=4,
        stereo=stereo,
    )
    ds = Kitti2015Dataset(root=root)
    batches = train_feed.stereo_train_batches(
        ds, (stereo.height, stereo.width), cfg.batch_size, seed=args.seed
    )
    state = train.make_train_state(
        cfg, seed=args.seed, learning_rate=args.lr, warmup_steps=args.warmup_steps
    )
    step_fn = train.make_stereo_train_step(cfg)
    for i, batch in enumerate(batches):
        if i >= args.steps:
            break
        state, m = step_fn(state, batch)
        if (i + 1) % args.log_every == 0:
            print(
                json.dumps({"step": i + 1, "loss": round(float(m["loss"]), 4)}),
                flush=True,
            )

    # Evaluate EPE on the training set (the round-1 protocol: shows
    # whether structure was learned at all vs the constant-D/2 collapse).
    from scenedepthestimation_tpu.api import Predictor

    variables = {"params": state.params}
    predictor = Predictor(cfg, variables)
    epe_sum, d1_sum, count = 0.0, 0.0, 0
    for batch in batched(ds, cfg.batch_size):
        out = predictor.stereo_forward(
            jnp.asarray(batch["left"]), jnp.asarray(batch["right"])
        )
        disp = np.asarray(out["disp"])
        for i in range(batch["n_real"]):
            err = np.abs(disp[i] - batch["gt_disp"][i])[batch["valid"][i]]
            epe_sum += float(err.mean())
            d1_sum += float(
                (
                    (err > 3.0)
                    & (err > 0.05 * batch["gt_disp"][i][batch["valid"][i]])
                ).mean()
            )
            count += 1
    result = {
        "lr": args.lr,
        "warmup_steps": args.warmup_steps,
        "temperature": args.temperature,
        "refine": args.refine,
        "aux_ce": args.aux_ce,
        "steps": args.steps,
        "epe": round(epe_sum / count, 3),
        "d1_all": round(d1_sum / count, 4),
    }
    print(json.dumps(result))
    if tmp is not None:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
