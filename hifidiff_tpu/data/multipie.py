"""Multi-PIE datasets (NHWC numpy, unified `split=` API).

Semantics mirror the reference (`dataset_multipie.py`): layout
`<root>/<split>/<pid>/<angle>/<light>.png`, angle sets EXTREME (8 cams) /
MODERATE (6), model_type in {e2m, m2f, e2f, uni} selecting input/GT angle
sets, GT angle chosen by which half of the angle list the input comes from,
optional blind degradation branch, 8-bit quantization of the LR input, and
optional `<light>_patch.png` GT component images.

Reference quirk kept configurable: the reference flips input and GT
*independently* (two separate `augment` calls, `dataset_multipie.py:94-99`);
`joint_flip=False` reproduces that, `joint_flip=True` flips them together.
"""

from __future__ import annotations

import os
import cv2
import numpy as np
from PIL import Image

from hifidiff_tpu.data.core import Dataset, Sample
from hifidiff_tpu.data.degradations import (
    blind_degrade,
    color_jitter_pair,
    quantize_8bit,
    to_gray3,
)

LIGHT_COND = ["%02d" % i for i in range(20)]
ANGLES_EXTREME = ["11_0", "12_0", "09_0", "19_1", "08_1", "20_0", "01_0",
                  "24_0"]
ANGLES_MODERATE = ["08_0", "13_0", "14_0", "05_0", "04_1", "19_0"]
GT_ANGLES_MODERATE = ["08_0", "19_0"]
GT_ANGLES_FRONTAL = ["05_1", "05_1"]


def _angle_sets(model_type: str):
    if model_type == "e2m":
        return ANGLES_EXTREME, GT_ANGLES_MODERATE
    if model_type == "m2f":
        return ANGLES_MODERATE, GT_ANGLES_FRONTAL
    if model_type == "e2f":
        return ANGLES_EXTREME, GT_ANGLES_FRONTAL
    if model_type == "uni":
        return [*ANGLES_EXTREME, *ANGLES_MODERATE], GT_ANGLES_FRONTAL
    raise ValueError(f"unknown model_type: {model_type}")


def _imread_f32(path: str) -> np.ndarray:
    """cv2 BGR read -> float32 [0,1] (converted to RGB at the end, like the
    reference's img2tensor(bgr2rgb=True))."""
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32) / 255.0


def _bgr2rgb(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1].copy()


class MultiPIEDataset(Dataset):
    def __init__(self, root: str, split: str = "train",
                 model_type: str = "uni", size: int = 128,
                 use_blind: bool = True, use_patch: bool = False,
                 augment_flip: bool = True, joint_flip: bool = False,
                 seed: int = 0):
        self.size = size
        self.use_blind = use_blind
        self.use_patch = use_patch
        self.augment_flip = augment_flip
        self.joint_flip = joint_flip
        self._rng = np.random.default_rng(seed)

        split_root = os.path.join(root, split)
        angles, gt_angles = _angle_sets(model_type)
        self.items = []
        for pid in sorted(os.listdir(split_root)):
            for idx, angle in enumerate(angles):
                gt_angle = (gt_angles[0] if idx < len(angles) // 2
                            else gt_angles[1])
                for light in LIGHT_COND:
                    gt = os.path.join(split_root, pid, gt_angle,
                                      f"{light}.png")
                    inp = os.path.join(split_root, pid, angle, f"{light}.png")
                    if os.path.exists(gt) and os.path.exists(inp):
                        patch = os.path.join(split_root, pid, gt_angle,
                                             f"{light}_patch.png")
                        self.items.append((inp, gt, patch))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Sample:
        inp_path, gt_path, patch_path = self.items[index]
        rng = self._rng
        inp = _imread_f32(inp_path)
        gt = _imread_f32(gt_path)

        if self.augment_flip:
            if self.joint_flip:
                if rng.uniform() < 0.5:
                    inp, gt = inp[:, ::-1], gt[:, ::-1]
            else:  # reference behavior: independent flips
                if rng.uniform() < 0.5:
                    inp = inp[:, ::-1]
                if rng.uniform() < 0.5:
                    gt = gt[:, ::-1]
        inp = np.ascontiguousarray(inp)
        gt = np.ascontiguousarray(gt)

        if self.use_blind:
            inp = blind_degrade(rng, inp, self.size)
            if rng.uniform() < 0.5:
                inp, gt = color_jitter_pair(rng, inp, gt)
            if rng.uniform() < 0.008:
                inp = to_gray3(inp)
        else:
            inp = cv2.resize(inp, (32, 32), interpolation=cv2.INTER_CUBIC)

        inp = cv2.resize(inp, (self.size, self.size),
                         interpolation=cv2.INTER_CUBIC)
        gt = cv2.resize(gt, (self.size, self.size),
                        interpolation=cv2.INTER_CUBIC)

        out: Sample = {
            "lr": quantize_8bit(_bgr2rgb(inp)),
            "gt": _bgr2rgb(gt),
        }
        if self.use_patch:
            patch = Image.open(patch_path).convert("RGB").resize(
                (self.size, self.size), Image.Resampling.BICUBIC)
            # single patch image -> (1, H, W, C) patch axis for the
            # key-region union mask
            out["patches"] = (np.asarray(patch, dtype=np.float32)
                              / 255.0)[None]
        return out


class MultiPIESingleViewDataset(Dataset):
    """Per-angle eval variant: (lr, gt, patch, angle)
    (`dataset_multipie.py:183-247`)."""

    def __init__(self, root: str, angle: str, split: str = "train",
                 size: int = 128):
        self.size = size
        self.angle = angle
        split_root = os.path.join(root, split)
        self.items = []
        for pid in sorted(os.listdir(split_root)):
            for light in LIGHT_COND:
                gt = os.path.join(split_root, pid, GT_ANGLES_FRONTAL[0],
                                  f"{light}.png")
                patch = os.path.join(split_root, pid, GT_ANGLES_FRONTAL[0],
                                     f"{light}_patch.png")
                inp = os.path.join(split_root, pid, angle, f"{light}.png")
                if all(map(os.path.exists, [gt, patch, inp])):
                    self.items.append((inp, gt, patch))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Sample:
        inp, gt, patch = self.items[index]
        size = self.size
        bic = Image.Resampling.BICUBIC
        lr = Image.open(inp).convert("RGB").resize((32, 32), bic).resize(
            (size, size), bic)
        return {
            "lr": np.asarray(lr, np.float32) / 255.0,
            "gt": np.asarray(Image.open(gt).convert("RGB").resize(
                (size, size), bic), np.float32) / 255.0,
            "patches": (np.asarray(Image.open(patch).convert("RGB").resize(
                (size, size), bic), np.float32) / 255.0)[None],
            "angle": self.angle,
        }


class MultiPIEInferenceDataset(Dataset):
    """LR inputs + their path strings (`dataset_multipie.py:250-290`)."""

    def __init__(self, root: str, split: str = "train",
                 model_type: str = "uni", size: int = 128):
        self.size = size
        split_root = os.path.join(root, split)
        angles, _ = _angle_sets(model_type)
        self.items = []
        for pid in sorted(os.listdir(split_root)):
            for angle in angles:
                for light in LIGHT_COND:
                    p = os.path.join(split_root, pid, angle, f"{light}.png")
                    if os.path.exists(p):
                        self.items.append(p)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Sample:
        bic = Image.Resampling.BICUBIC
        img = Image.open(self.items[index]).convert("RGB")
        img = img.resize((32, 32), bic).resize((self.size, self.size), bic)
        return {"lr": np.asarray(img, np.float32) / 255.0,
                "path": self.items[index]}


class MultiPIEIDCDataset(Dataset):
    """Triplets for IDC pretraining; negative = random other pid's frontal
    (`dataset_multipie.py:293-371`). Input degrades by a /4 bicubic
    down/up instead of /8 and is 8-bit quantized."""

    def __init__(self, root: str, split: str = "train", size: int = 128,
                 seed: int = 0):
        self.size = size
        split_root = os.path.join(root, split)
        rng = np.random.default_rng(seed)
        angles = [*ANGLES_EXTREME, *ANGLES_MODERATE]
        pids = sorted(os.listdir(split_root))
        self.items = []
        for pid in pids:
            others = [p for p in pids if p != pid]
            for idx, angle in enumerate(angles):
                gt_angle = GT_ANGLES_FRONTAL[0]
                for light in LIGHT_COND:
                    gt = os.path.join(split_root, pid, gt_angle,
                                      f"{light}.png")
                    inp = os.path.join(split_root, pid, angle, f"{light}.png")
                    if os.path.exists(gt) and os.path.exists(inp):
                        while True:
                            other_pid = others[int(rng.integers(len(others)))]
                            other = os.path.join(split_root, other_pid,
                                                 gt_angle, f"{light}.png")
                            if os.path.exists(other):
                                break
                        self.items.append((inp, gt, other))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Sample:
        inp_path, gt_path, other_path = self.items[index]
        size = self.size

        def base(p):
            img = cv2.resize(cv2.imread(p), (size, size),
                             interpolation=cv2.INTER_CUBIC)
            return img.astype(np.float32) / 255.0

        inp = base(inp_path)
        inp = cv2.resize(inp, (size // 4, size // 4),
                         interpolation=cv2.INTER_CUBIC)
        inp = cv2.resize(inp, (size, size), interpolation=cv2.INTER_CUBIC)
        return {
            "lr": quantize_8bit(_bgr2rgb(inp)),
            "gt": _bgr2rgb(base(gt_path)),
            "other": _bgr2rgb(base(other_path)),
        }
