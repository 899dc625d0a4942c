"""IDC — Identity-Consistency encoder.

The reference's IDC (`models/idc/model.py:102-166`) is a from-scratch
ResNet-50 trunk with the classifier removed, producing a 2048-d identity
embedding; see hifidiff_tpu/nn/resnet.py for the trunk. This module is the
model-level alias used by the refiner composition and the IDC pretraining
stage (`pretrain_idc.py`, `test_idc.py`).
"""

from __future__ import annotations

from hifidiff_tpu.nn.resnet import ResNet50 as IDCEncoder

__all__ = ["IDCEncoder"]
