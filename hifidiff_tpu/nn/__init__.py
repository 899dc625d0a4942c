from hifidiff_tpu.nn.layers import LayerNorm2d, torch_conv_kernel_init, torch_fan_in_bias_init
from hifidiff_tpu.nn.naf import NAFBlock, ConditionalNAFBlock
from hifidiff_tpu.nn.stn import STNBlock
from hifidiff_tpu.nn.hca import HybridCrossAttention
from hifidiff_tpu.nn.resnet import ResNet50, Bottleneck

__all__ = [
    "LayerNorm2d",
    "NAFBlock",
    "ConditionalNAFBlock",
    "STNBlock",
    "HybridCrossAttention",
    "ResNet50",
    "Bottleneck",
    "torch_conv_kernel_init",
    "torch_fan_in_bias_init",
]
