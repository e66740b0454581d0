from scenedepthestimation_tpu.utils import checkpoint, metrics, torch_import

__all__ = ["checkpoint", "metrics", "torch_import"]
