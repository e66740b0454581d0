"""Fine-grained in-situ knockouts of the temporal step's cfirst loss.

Round-3 state: full step 470-490 ms at b8 192x640 fp32, no-loss 28 ms,
isolated loss fwd+bwd 96 ms -> ~340 ms unexplained when embedded. This
script re-runs the embedded grad (wrt params) with surgical knockouts of
the cfirst loss body (copied here with knock flags; primitives imported
from the package) to localize the cost.

Usage: python -u bench/profile_temporal_knock2.py [batch] [variant...]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import train as T
from scenedepthestimation_tpu.configs import get as get_cfg
from scenedepthestimation_tpu.losses import (
    edge_aware_smoothness_cf,
    photometric_error_cf,
)
from scenedepthestimation_tpu.models.posenet import PoseNet
from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
from scenedepthestimation_tpu.ops.preprocess import normalize, preprocess
from scenedepthestimation_tpu.ops.project import (
    pack4_table,
    pose_vec_to_mat,
    reproject_coords,
    sample_table_cfirst,
)
from scenedepthestimation_tpu.ops.upsample import upsample2x_rank3
from scenedepthestimation_tpu.train import _apply_mono_train, _to01_at
from scenedepthestimation_tpu.utils.profiling import timed


def cfirst_loss(disps, target, sources, t_mats, k, k_inv,
                min_depth, max_depth, smoothness_weight=1e-3, *,
                knock=frozenset()):
    h, w = target.shape[1:3]
    target_cf = target.transpose(0, 3, 1, 2)
    src_cf = [jax.lax.stop_gradient(s).transpose(0, 3, 1, 2)
              for s in sources]
    if "identity" in knock:
        identity_errs = []
    else:
        identity_errs = [photometric_error_cf(s, target_cf) + 1e-5
                         for s in src_cf]
    tables = [pack4_table(jax.lax.stop_gradient(s)) for s in sources]

    if "l1only" in knock:
        def perr(a, b):
            return jnp.mean(jnp.abs(a - b), axis=1)[:, 1:-1, 1:-1]
    else:
        perr = photometric_error_cf

    total = 0.0
    for s, disp in sorted(disps.items()):
        d = disp.astype(jnp.float32)[..., 0]
        for _ in range(s):
            d = upsample2x_rank3(d)
        _, depth = disp_to_depth(d, min_depth, max_depth)

        reproj_errs = []
        for table, t_mat in zip(tables, t_mats):
            x, y = reproject_coords(depth, k, k_inv, t_mat)
            if "coordsgrad" in knock:
                x, y = jax.lax.stop_gradient((x, y))
            if "gather" in knock:
                # fixed shift instead of the data-dependent sample;
                # keeps shapes + lerp-free chain alive
                recon = jnp.roll(
                    jax.lax.stop_gradient(target_cf), 1, axis=-1
                ) + 1e-6 * (x + y)[:, None]
            else:
                recon = sample_table_cfirst(table, x, y, h, w)
            reproj_errs.append(perr(recon, target_cf))
        all_errs = jnp.stack(reproj_errs + identity_errs, axis=0)
        if "min" in knock:
            min_err = jnp.mean(all_errs, axis=0)
        else:
            min_err = jnp.min(all_errs, axis=0)

        if "smooth" in knock:
            smooth = 0.0
        else:
            smooth = edge_aware_smoothness_cf(d, target_cf)
        total = total + jnp.mean(min_err) + smoothness_weight * smooth / (2.0**s)
    return total / len(disps)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = set(sys.argv[2:])
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
    net_hw = (h, w)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    frames = jnp.asarray(
        rng.integers(0, 256, size=(b, 3, h, w, 3), dtype=np.uint8))
    k_mat = jnp.asarray(np.broadcast_to(
        np.array([[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h],
                  [0, 0, 1]], np.float32), (b, 3, 3)))
    state = T.make_temporal_train_state(cfg, seed=0)
    pose_model = PoseNet(dtype=dtype)

    def make_loss_fn(knock=frozenset(), scales=(0, 1, 2, 3), n_src=2,
                     fwd_only=False):
        def loss_fn(params, batch_stats, batch):
            prev = _to01_at(batch["frames"][:, 0], net_hw)
            tgt = _to01_at(batch["frames"][:, 1], net_hw)
            nxt = _to01_at(batch["frames"][:, 2], net_hw)
            x = preprocess(batch["frames"][:, 1], net_hw, cfg.pre,
                           compute_dtype=dtype)
            disps, _ = _apply_mono_train(
                params["depth"], batch_stats["depth"], x, cfg, dtype)
            disps = {s: d for s, d in disps.items() if s in scales}

            def pose_for(a_, b_, invert):
                pair = jnp.concatenate(
                    [normalize(a_, cfg.pre.mean, cfg.pre.std).astype(dtype),
                     normalize(b_, cfg.pre.mean, cfg.pre.std).astype(dtype)],
                    axis=-1)
                (aa, tt), _ = pose_model.apply(
                    {"params": params["pose"],
                     "batch_stats": batch_stats["pose"]},
                    pair, train=True, mutable=["batch_stats"])
                return pose_vec_to_mat(aa, tt, invert=invert)

            t_prev = pose_for(prev, tgt, True)
            t_next = pose_for(tgt, nxt, False)
            kk = batch["K"].astype(jnp.float32)
            ki = jnp.linalg.inv(kk)
            srcs = [prev, nxt][:n_src]
            tms = [t_prev, t_next][:n_src]
            if fwd_only:
                keep = 1e-9 * (
                    sum(jnp.sum(d.astype(jnp.float32))
                        for d in disps.values())
                    + jnp.sum(t_prev) + jnp.sum(t_next))
                disps = jax.lax.stop_gradient(disps)
                tms = jax.lax.stop_gradient(tms)
            else:
                keep = 0.0
            return keep + cfirst_loss(
                disps, tgt, srcs, tms, kk, ki,
                cfg.mono.min_depth, cfg.mono.max_depth, knock=knock)

        return loss_fn

    variants = [
        ("full        ", make_loss_fn()),
        ("fwd-only    ", make_loss_fn(fwd_only=True)),
        ("scale0-only ", make_loss_fn(scales=(0,))),
        ("scale3-only ", make_loss_fn(scales=(3,))),
        ("one-source  ", make_loss_fn(n_src=1)),
        ("no-gather   ", make_loss_fn(knock={"gather"})),
        ("no-coordgrad", make_loss_fn(knock={"coordsgrad"})),
        ("l1-only     ", make_loss_fn(knock={"l1only"})),
        ("no-identity ", make_loss_fn(knock={"identity"})),
        ("mean-not-min", make_loss_fn(knock={"min"})),
        ("no-smooth   ", make_loss_fn(knock={"smooth"})),
    ]
    batch = {"frames": frames, "K": k_mat}

    for name, lf in variants:
        if only and name.strip() not in only:
            continue
        grad_fn = jax.grad(lf)

        def g(frames_, k_, params_, stats_):
            gr = grad_fn(params_, stats_, {"frames": frames_, "K": k_})
            return sum(x.astype(jnp.float32).mean()
                       for x in jax.tree_util.tree_leaves(gr))

        ms = timed(g, frames, k_mat, state.params, state.batch_stats)
        print(f"{name}: {ms:8.2f} ms fwd+bwd wrt params", flush=True)


if __name__ == "__main__":
    main()
