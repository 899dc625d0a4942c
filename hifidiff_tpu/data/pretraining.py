"""HQ face datasets for unconditional denoiser pretraining
(`dataset_pretraining.py`): Multi-PIE frontal+moderate crops (cv2 bicubic)
and flat-directory CelebA-HQ (PIL bicubic), both returning float32 [0,1]
NHWC under key "image"."""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from hifidiff_tpu.data.core import Dataset, Sample
from hifidiff_tpu.data.multipie import (
    ANGLES_MODERATE,
    GT_ANGLES_FRONTAL,
    LIGHT_COND,
)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class MultiPIEHQDataset(Dataset):
    def __init__(self, root: str, split: str = "train", size: int = 128):
        self.size = size
        split_root = os.path.join(root, split)
        angles = [*ANGLES_MODERATE, GT_ANGLES_FRONTAL[0]]
        self.paths = []
        for pid in sorted(os.listdir(split_root)):
            for angle in angles:
                for light in LIGHT_COND:
                    p = os.path.join(split_root, pid, angle, f"{light}.png")
                    if os.path.exists(p):
                        self.paths.append(p)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Sample:
        img = cv2.imread(self.paths[index]).astype(np.float32) / 255.0
        img = cv2.resize(img, (self.size, self.size),
                         interpolation=cv2.INTER_CUBIC)
        return {"image": img[..., ::-1].copy()}  # BGR -> RGB


class CelebAHQDataset(Dataset):
    def __init__(self, root: str, size: int = 128):
        self.size = size
        self.paths = [
            os.path.join(root, f) for f in sorted(os.listdir(root))
            if os.path.isfile(os.path.join(root, f))
            and f.lower().endswith(IMG_EXTS)
        ]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Sample:
        img = Image.open(self.paths[index]).convert("RGB").resize(
            (self.size, self.size), Image.Resampling.BICUBIC)
        return {"image": np.asarray(img, np.float32) / 255.0}
