"""A/B the temporal-loss bodies (channels-first vs NHWC+checkpoint)
inside the REAL jitted train step on the current backend.

Usage: python -u bench/probe_temporal_ab.py [batch]
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
from scenedepthestimation_tpu.ops import project
from scenedepthestimation_tpu.utils.profiling import timed


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
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
    batch = {"frames": frames, "K": k_mat}

    for name, cf, pack4 in [
        ("nhwc+ckpt, gather4", False, False),
        ("nhwc+ckpt, pack4  ", False, True),
        ("cfirst            ", True, None),
    ]:
        losses.set_use_cfirst(cf)
        project.set_use_pack4(pack4)
        try:
            step = jax.jit(T.make_mono_temporal_train_step(cfg), donate_argnums=())
            state = T.make_temporal_train_state(cfg, seed=0)

            def run(frames_, state_):
                new_state, metrics = step(
                    state_, {"frames": frames_, "K": k_mat}
                )
                return metrics["loss"] + 0.0 * jax.tree_util.tree_leaves(
                    new_state.params
                )[0].astype(jnp.float32).mean()

            ms = timed(run, frames, state)
            print(f"{name}: {ms:8.2f} ms/step  ({b / ms * 1000:.1f} fps)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            losses.set_use_cfirst(None)
            project.set_use_pack4(None)


if __name__ == "__main__":
    main()
