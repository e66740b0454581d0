from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.models.stereo import StereoNet

__all__ = ["ResNetEncoder", "DepthDecoder", "MonoDepthNet", "StereoNet"]
