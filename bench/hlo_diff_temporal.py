"""Compare compiled-HLO op histograms + cost analysis of the temporal
loss grad ISOLATED (wrt disps+pose, ~96 ms measured) vs EMBEDDED in the
train step (wrt params, ~470 ms measured) to find the ~340 ms
composition gap: duplicated gathers (remat), scatters, transposes, or
flops/bytes blowup.

Usage: python -u bench/hlo_diff_temporal.py [batch]
"""

from __future__ import annotations

import collections
import pathlib
import re
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

OPS = (
    "gather", "scatter", "convolution", "dot", "while", "transpose",
    "reduce-window", "all-reduce", "rng", "sort", "dynamic-slice",
    "dynamic-update-slice", "concatenate", "pad", "reduce", "custom-call",
)


def histo(hlo: str) -> dict:
    h = collections.Counter()
    # count real ops (lines like "  %name = type op(...)" or fusion kinds)
    for line in hlo.splitlines():
        m = re.search(r"=\s+\S+\s+([a-z][a-z0-9_-]*)\(", line)
        if not m:
            continue
        op = m.group(1)
        if op.startswith("fusion"):
            km = re.search(r'kind=(\w+)', line)
            op = f"fusion/{km.group(1) if km else '?'}"
        h[op] += 1
    return h


def report(name: str, lowered):
    comp = lowered.compile()
    txt = comp.as_text()
    pathlib.Path(f"/tmp/hlo_{name}.txt").write_text(txt)
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"== {name}: flops={flops/1e9:.1f} G  bytes={bytes_/1e9:.2f} GB")
    h = histo(txt)
    interesting = {
        k: v for k, v in h.items()
        if any(k.startswith(o) for o in OPS) or k.startswith("fusion")
    }
    for k in sorted(interesting):
        print(f"   {k:28s} {interesting[k]}")
    print(f"   (total HLO instrs: {sum(h.values())}; dump /tmp/hlo_{name}.txt)",
          flush=True)
    return txt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
    net_hw = (h, w)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # ---------------- isolated --------------------------------------
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

    def loss_iso(d_, a_, t_, tgt, s0, s1, k_, ki):
        tm = [
            pose_vec_to_mat(a_[:, 0], t_[:, 0], invert=True),
            pose_vec_to_mat(a_[:, 1], t_[:, 1]),
        ]
        return losses.mono_temporal_selfsup_loss(
            d_, tgt, [s0, s1], tm, k_, ki,
            cfg.mono.min_depth, cfg.mono.max_depth,
        )

    def gsum_iso(d_, a_, t_, tgt, s0, s1, k_, ki):
        g = jax.grad(loss_iso, argnums=(0, 1))(d_, a_, t_, tgt, s0, s1, k_, ki)
        return sum(x.astype(jnp.float32).mean()
                   for x in jax.tree_util.tree_leaves(g))

    report("iso", jax.jit(gsum_iso).lower(
        disps, aa, tr, target, src0, src1, k, k_inv))

    # ---------------- embedded --------------------------------------
    frames = jnp.asarray(
        rng.integers(0, 256, size=(b, 3, h, w, 3), dtype=np.uint8))
    state = T.make_temporal_train_state(cfg, seed=0)
    pose_model = PoseNet(dtype=dtype)

    def loss_emb(params, batch_stats, batch):
        prev = _to01_at(batch["frames"][:, 0], net_hw)
        tgt = _to01_at(batch["frames"][:, 1], net_hw)
        nxt = _to01_at(batch["frames"][:, 2], net_hw)
        x = preprocess(batch["frames"][:, 1], net_hw, cfg.pre,
                       compute_dtype=dtype)
        d_, _ = _apply_mono_train(
            params["depth"], batch_stats["depth"], x, cfg, dtype)

        def pose_for(a_, b_, invert):
            pair = jnp.concatenate(
                [normalize(a_, cfg.pre.mean, cfg.pre.std).astype(dtype),
                 normalize(b_, cfg.pre.mean, cfg.pre.std).astype(dtype)],
                axis=-1)
            (ax, tt), _ = pose_model.apply(
                {"params": params["pose"],
                 "batch_stats": batch_stats["pose"]},
                pair, train=True, mutable=["batch_stats"])
            return pose_vec_to_mat(ax, tt, invert=invert)

        t_prev = pose_for(prev, tgt, True)
        t_next = pose_for(tgt, nxt, False)
        kk = batch["K"].astype(jnp.float32)
        ki = jnp.linalg.inv(kk)
        return losses.mono_temporal_selfsup_loss(
            d_, tgt, [prev, nxt], [t_prev, t_next], kk, ki,
            cfg.mono.min_depth, cfg.mono.max_depth)

    def gsum_emb(params, batch_stats, batch):
        g = jax.grad(loss_emb)(params, batch_stats, batch)
        return sum(x.astype(jnp.float32).mean()
                   for x in jax.tree_util.tree_leaves(g))

    report("emb", jax.jit(gsum_emb).lower(
        state.params, state.batch_stats, {"frames": frames, "K": k}))


if __name__ == "__main__":
    main()
