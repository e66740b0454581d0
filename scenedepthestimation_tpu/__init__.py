"""scenedepthestimation_tpu — a TPU-native scene-depth-estimation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
WHDY/SceneDepthEstimation (see SURVEY.md — the reference mount was empty,
so SURVEY.md §2's component inventory is the spec):

* Monocular depth: ResNet-18 encoder + U-Net decoder with multi-scale
  sigmoid disparity heads and disparity→depth conversion (C6–C8, C13).
* Stereo disparity: siamese feature extraction, 1-D correlation cost
  volume, conv aggregation, soft-argmin regression (C9–C12).
* On-device preprocessing (C2), KITTI/NYUv2 datasets (C3–C5), Eigen-split
  and KITTI-2015 metrics (C15), Orbax + torch checkpoint import (C16),
  predict/eval public API (C19–C20), data-parallel sharding over a TPU
  mesh with a pipelined input feed (SURVEY §5.8).

Everything computes in NHWC (channels-last) layout — the TPU-friendly
layout XLA tiles onto the MXU.
"""

from scenedepthestimation_tpu.utils.compile_cache import maybe_enable_from_env as _cc

# Opt-in persistent compilation cache (serving cold-start): honored
# before any program can be built. No-op unless SCENEDEPTH_COMPILE_CACHE
# is set in the environment.
_cc()

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import (
    load_weights,
    predict_mono,
    predict_stereo,
    predict_batch,
)

__version__ = "0.1.0"

__all__ = [
    "configs",
    "load_weights",
    "predict_mono",
    "predict_stereo",
    "predict_batch",
    "__version__",
]
