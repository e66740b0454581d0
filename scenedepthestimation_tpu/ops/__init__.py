"""TPU-native ops (SURVEY.md north-star hot ops, C2/C7/C8/C10/C12).

Every op ships a pure ``jax.numpy`` reference implementation plus (where
profitable) a Pallas TPU kernel behind a dispatch flag, with the jnp impl
as the unit-test oracle (SURVEY §4.2, §7.5).
"""

from scenedepthestimation_tpu.ops.upsample import upsample2x, upsample_concat
from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth, depth_from_disparity
from scenedepthestimation_tpu.ops.correlation import correlation1d
from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin

__all__ = [
    "upsample2x",
    "upsample_concat",
    "disp_to_depth",
    "depth_from_disparity",
    "correlation1d",
    "soft_argmin",
]
