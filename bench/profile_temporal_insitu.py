"""In-situ knock-out decomposition of the temporal train step.

profile_temporal.py's isolated components sum to ~150 ms but the step
measures 491 ms (b8 192x640 fp32). Time value_and_grad of the step's
ACTUAL loss_fn with pieces knocked out to find where the remainder
lives (suspects: 2x PoseNet fwd+bwd, on-device linalg.inv of K,
preprocess/_to01 chains, Adam/donation effects):

  full        the step's loss_fn as-is
  no-loss     temporal loss replaced by sum(disps)+sum(poses)
  no-pose     t_mats = constant identity (PoseNet out of the graph)
  host-kinv   k_inv precomputed outside the jit

Usage: python -u bench/profile_temporal_insitu.py [batch]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import losses
from scenedepthestimation_tpu import train as T
from scenedepthestimation_tpu.configs import get as get_cfg
from scenedepthestimation_tpu.models.posenet import PoseNet
from scenedepthestimation_tpu.ops.preprocess import normalize, preprocess
from scenedepthestimation_tpu.ops.project import pose_vec_to_mat
from scenedepthestimation_tpu.train import _apply_mono_train, _to01_at
from scenedepthestimation_tpu.utils.profiling import timed


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
    net_hw = (h, w)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    frames = jnp.asarray(
        rng.integers(0, 256, size=(b, 3, h, w, 3), dtype=np.uint8)
    )
    k_mat = jnp.asarray(
        np.broadcast_to(
            np.array(
                [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]],
                np.float32,
            ),
            (b, 3, 3),
        )
    )
    k_inv_host = jnp.asarray(np.linalg.inv(np.asarray(k_mat)))

    state = T.make_temporal_train_state(cfg, seed=0)
    pose_model = PoseNet(dtype=dtype)

    def make_loss_fn(use_loss=True, use_pose=True, host_kinv=False):
        def loss_fn(params, batch_stats, batch):
            prev = _to01_at(batch["frames"][:, 0], net_hw)
            target = _to01_at(batch["frames"][:, 1], net_hw)
            nxt = _to01_at(batch["frames"][:, 2], net_hw)
            x = preprocess(
                batch["frames"][:, 1], net_hw, cfg.pre, compute_dtype=dtype
            )
            disps, _ = _apply_mono_train(
                params["depth"], batch_stats["depth"], x, cfg, dtype
            )

            if use_pose:
                def pose_for(a_, b_, invert):
                    pair = jnp.concatenate(
                        [
                            normalize(a_, cfg.pre.mean, cfg.pre.std).astype(dtype),
                            normalize(b_, cfg.pre.mean, cfg.pre.std).astype(dtype),
                        ],
                        axis=-1,
                    )
                    (aa, tt), _ = pose_model.apply(
                        {
                            "params": params["pose"],
                            "batch_stats": batch_stats["pose"],
                        },
                        pair,
                        train=True,
                        mutable=["batch_stats"],
                    )
                    return pose_vec_to_mat(aa, tt, invert=invert)

                t_prev = pose_for(prev, target, True)
                t_next = pose_for(target, nxt, False)
            else:
                eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
                t_prev = t_next = eye + 0.0 * jnp.sum(
                    jax.tree_util.tree_leaves(params["pose"])[0]
                )

            kk = batch["K"].astype(jnp.float32)
            ki = batch["K_inv"] if host_kinv else jnp.linalg.inv(kk)

            if not use_loss:
                return (
                    sum(jnp.sum(d.astype(jnp.float32)) for d in disps.values())
                    + jnp.sum(t_prev) + jnp.sum(t_next) + 0.0 * jnp.sum(ki)
                )
            return losses.mono_temporal_selfsup_loss(
                disps, target, [prev, nxt], [t_prev, t_next], kk, ki,
                cfg.mono.min_depth, cfg.mono.max_depth,
            )

        return loss_fn

    variants = [
        ("full       ", make_loss_fn()),
        ("no-loss    ", make_loss_fn(use_loss=False)),
        ("no-pose    ", make_loss_fn(use_pose=False)),
        ("host-kinv  ", make_loss_fn(host_kinv=True)),
    ]
    batch = {"frames": frames, "K": k_mat, "K_inv": k_inv_host}

    for name, lf in variants:
        grad_fn = jax.grad(lf)

        def g(frames_, k_, ki_, params_, stats_):
            gr = grad_fn(params_, stats_, {"frames": frames_, "K": k_, "K_inv": ki_})
            return sum(
                x.astype(jnp.float32).mean()
                for x in jax.tree_util.tree_leaves(gr)
            )

        ms = timed(g, frames, k_mat, k_inv_host, state.params, state.batch_stats)
        print(f"{name}: {ms:8.2f} ms fwd+bwd wrt params", flush=True)


if __name__ == "__main__":
    main()
