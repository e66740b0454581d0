"""Temporal train-step component profile on the real chip.

The cfirst loss rewrite took the b8 192x640 fp32 step 622 -> 491 ms —
less than the lane-padding model predicted, so something else
dominates. Time each component in isolation with the fori_loop
harness (utils/profiling.timed; all arrays passed as ARGS — captured
device arrays become jit constants, which the tunneled backend
rejects / would distort timing).

Usage: python -u bench/profile_temporal.py [batch]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import benchmark as B
from scenedepthestimation_tpu import losses
from scenedepthestimation_tpu.configs import get as get_cfg
from scenedepthestimation_tpu.ops.project import (
    pack4_table,
    pose_vec_to_mat,
    reproject_coords,
    sample_table_cfirst,
)
from scenedepthestimation_tpu.utils.profiling import timed


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(0)

    def unif(shape, lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, shape).astype(np.float32))

    target = unif((b, h, w, 3))
    src0, src1 = unif((b, h, w, 3)), unif((b, h, w, 3))
    disps = {s: unif((b, h >> s, w >> s, 1), 0.1, 0.9) for s in range(4)}
    k = jnp.broadcast_to(
        jnp.asarray(
            [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]],
            jnp.float32,
        ),
        (b, 3, 3),
    )
    k_inv = jnp.linalg.inv(k)
    aa = jnp.asarray(rng.normal(0, 0.01, (b, 2, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(0, 0.05, (b, 2, 3)).astype(np.float32))
    depth = 1.0 / (0.01 + disps[0][..., 0] * 0.99)

    def loss_of(tgt, d_, a_, t_, s0, s1, k_, ki):
        tm = [
            pose_vec_to_mat(a_[:, 0], t_[:, 0], invert=True),
            pose_vec_to_mat(a_[:, 1], t_[:, 1]),
        ]
        return losses.mono_temporal_selfsup_loss(
            d_, tgt, [s0, s1], tm, k_, ki,
            cfg.mono.min_depth, cfg.mono.max_depth,
        )

    ms = timed(loss_of, target, disps, aa, tr, src0, src1, k, k_inv)
    print(f"loss fwd                     : {ms:8.2f} ms", flush=True)

    grad_fn = jax.grad(
        lambda d_, a_, tgt, t_, s0, s1, k_, ki: loss_of(
            tgt, d_, a_, t_, s0, s1, k_, ki
        ),
        argnums=(0, 1),
    )

    def gsum(tgt, d_, a_, t_, s0, s1, k_, ki):
        g = grad_fn(d_, a_, tgt, t_, s0, s1, k_, ki)
        return sum(
            x.astype(jnp.float32).mean()
            for x in jax.tree_util.tree_leaves(g)
        )

    ms = timed(gsum, target, disps, aa, tr, src0, src1, k, k_inv)
    print(f"loss fwd+bwd (wrt disps+pose): {ms:8.2f} ms", flush=True)

    # --- single components (multiply by their per-step counts)
    ms = timed(
        lambda d_, k_, ki, a_, t_: jnp.stack(
            reproject_coords(
                d_, k_, ki, pose_vec_to_mat(a_[:, 0], t_[:, 0], invert=True)
            )
        ),
        depth, k, k_inv, aa, tr,
    )
    print(f"coords x1  (step has 8)      : {ms:8.2f} ms", flush=True)

    tbl = pack4_table(src0)
    t_mat0 = pose_vec_to_mat(aa[:, 0], tr[:, 0], invert=True)
    x, y = reproject_coords(depth, k, k_inv, t_mat0)
    ms = timed(
        lambda x_, y_, tb: sample_table_cfirst(tb, x_, y_, h, w), x, y, tbl
    )
    print(f"gather x1  (step has 8)      : {ms:8.2f} ms", flush=True)

    ms = timed(lambda s_: pack4_table(s_).mean(), src0)
    print(f"pack4_table x1 (step has 2)  : {ms:8.2f} ms", flush=True)

    tcf = target.transpose(0, 3, 1, 2)
    scf = src0.transpose(0, 3, 1, 2)
    ms = timed(lambda a_, b_: losses.photometric_error_cf(a_, b_), scf, tcf)
    print(f"photometric_cf x1 (has 10)   : {ms:8.2f} ms", flush=True)

    ms = timed(lambda a_, b_: losses.photometric_error(a_, b_), src0, target)
    print(f"photometric_nhwc x1          : {ms:8.2f} ms", flush=True)

    ms = timed(
        lambda d_, t_: losses.edge_aware_smoothness_cf(d_[..., 0], t_),
        disps[0], tcf,
    )
    print(f"smoothness_cf x1 (has 4)     : {ms:8.2f} ms", flush=True)

    # grad of one photometric+gather chain wrt depth (the bwd shape)
    def chain(d_, tb, tgt_cf, k_, ki, a_, t_):
        tm = pose_vec_to_mat(a_[:, 0], t_[:, 0], invert=True)
        x_, y_ = reproject_coords(d_, k_, ki, tm)
        recon = sample_table_cfirst(tb, x_, y_, h, w)
        return losses.photometric_error_cf(recon, tgt_cf).mean()

    cgrad = jax.grad(chain)
    ms = timed(
        lambda d_, tb, tcf_, k_, ki, a_, t_: cgrad(
            d_, tb, tcf_, k_, ki, a_, t_
        ).mean(),
        depth, tbl, tcf, k, k_inv, aa, tr,
    )
    print(f"chain fwd+bwd x1 (has 8)     : {ms:8.2f} ms", flush=True)

    # --- reference steps via the real bench harness
    r = B.run_train_bench(mode="supervised", batch_size=b, iters=10)
    print(f"supervised step              : {r['step_ms']:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
