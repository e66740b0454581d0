"""Temporal augmentation cost/no-harm probe (VERDICT r4 missing-#3:
"plus a short synthetic-proxy run showing no harm").

Reuses probe_temporal_protocol's translating-camera scene (known
sinusoid GT depth; 0.3849 abs_rel = the constant-prediction score) and
chunked-fori harness, and runs the DEFAULT full-res 4-scale protocol
with `make_mono_temporal_train_step(augment=...)` off vs on — same
init, same budget, same scene. Reports step_ms (the augmentation's
compute cost rides the same jitted program) and median-scaled abs_rel.

"No harm" claim being tested: the triplet-consistent flip (with the
principal point mirrored in K) keeps the objective well-posed — the
augmented run must still recover real structure (abs_rel well under
the 0.3849 constant score), not park at the identity optimum; some
fixed-budget quality lag vs un-augmented is expected and fine (that is
what augmentation trades for generalization on real data).

Usage: python -u bench/probe_temporal_aug.py [steps]
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from probe_temporal_protocol import B, H, W, make_scene
from scenedepthestimation_tpu import train as T
from scenedepthestimation_tpu.configs import get as get_cfg
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
from scenedepthestimation_tpu.ops.preprocess import preprocess


def train_and_eval(cfg, batch, gt, steps, augment):
    from jax import lax

    step_fn = T.make_mono_temporal_train_step(cfg, augment=augment)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
    base_key = jax.random.PRNGKey(17)

    @jax.jit
    def run(state, start, n):
        def body(i, st):
            b = batch
            if augment:
                b = {**batch, "rng": jax.random.fold_in(base_key, start + i)}
            st, _ = step_fn(st, b)
            return st

        state = lax.fori_loop(0, n, body, state)
        x = preprocess(
            batch["frames"][:, 1], (H, W), cfg.pre, compute_dtype=dtype
        )
        disps = model.apply(
            {"params": state.params["depth"],
             "batch_stats": state.batch_stats["depth"]},
            x,
        )
        return state, disps[0].astype(jnp.float32)

    state = T.make_temporal_train_state(cfg, seed=0, learning_rate=1e-4)
    state, disp = run(state, 0, 2)  # compile + burn-in
    float(jnp.sum(disp))  # value fetch (tunnel: block_until_ready lies)
    chunk = 300
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        state, disp = run(state, done, n)
        float(jnp.sum(disp))
        done += n
    dt = time.perf_counter() - t0

    _, depth = disp_to_depth(
        np.asarray(disp, np.float32)[..., 0],
        cfg.mono.min_depth, cfg.mono.max_depth,
    )
    errs = []
    for b in range(depth.shape[0]):
        d = depth[b] * (np.median(gt) / np.median(depth[b]))
        d = np.clip(d, 1e-3, 80.0)
        errs.append(float(np.mean(np.abs(d - gt) / gt)))
    return 1e3 * dt / steps, float(np.mean(errs))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    base = get_cfg("mono_kitti_192x640_fp32")
    frames, k_mat, gt = make_scene()
    batch = {"frames": frames, "K": k_mat}
    cfg = dataclasses.replace(
        base,
        batch_size=B,
        mono=dataclasses.replace(
            base.mono, min_depth=4.0, max_depth=16.0,  # scene-scaled sigmoid
        ),
    )
    for augment in (False, True):
        step_ms, ar = train_and_eval(cfg, batch, gt, steps, augment)
        print(
            json.dumps(
                {
                    "augment": augment,
                    "step_ms": round(step_ms, 2),
                    "fps_per_chip": round(1e3 / step_ms * B, 1),
                    "abs_rel_synth": round(ar, 4),
                    "steps": steps,
                    "constant_pred_score": 0.3849,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
