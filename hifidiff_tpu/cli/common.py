"""Shared CLI machinery: typed dataclass configs -> argparse flags,
synthetic datasets for smoke runs, device/mesh setup.

Replaces the reference's per-script argparse blocks and hardcoded paths
(`train_cr.py:15-48`, `pretrain_idc.py:80-83`, SURVEY.md §5 config row)
with one dataclass-driven CLI; every stage accepts `--synthetic N` to run
on generated data (smoke tests / CI without the private datasets)."""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Type, TypeVar

import numpy as np

from hifidiff_tpu.data.core import Dataset, Sample

T = TypeVar("T")


def add_dataclass_args(parser: argparse.ArgumentParser, cls: Type[T]) -> None:
    for f in dataclasses.fields(cls):
        name = "--" + f.name.replace("_", "-")
        if f.type in ("bool", bool):
            parser.add_argument(name, type=lambda s: s.lower() in
                                ("1", "true", "yes"),
                                default=f.default, metavar="BOOL")
        else:
            ftype = {int: int, float: float, str: str}.get(f.type, str) \
                if not isinstance(f.type, str) else \
                {"int": int, "float": float, "str": str,
                 "Optional[str]": str, "Optional[int]": int}.get(f.type, str)
            parser.add_argument(name, type=ftype, default=f.default)


def parse_config(cls: Type[T], argv=None,
                 description: str = "") -> T:
    parser = argparse.ArgumentParser(description=description)
    add_dataclass_args(parser, cls)
    args = parser.parse_args(argv)
    kwargs = {f.name: getattr(args, f.name)
              for f in dataclasses.fields(cls)}
    return cls(**kwargs)


def parse_ints(s: str) -> tuple:
    """'2,2,4,8' -> (2, 2, 4, 8) for depth/width-list flags."""
    return tuple(int(x) for x in str(s).split(",") if x.strip())


class SyntheticFaceDataset(Dataset):
    """Random face-shaped samples for smoke runs. Keys configurable to
    mimic each real dataset's sample dict."""

    def __init__(self, n: int = 64, size: int = 128, keys=("lr", "gt"),
                 num_patches: int = 4, seed: int = 0):
        self.n = n
        self.size = size
        self.keys = keys
        self.num_patches = num_patches
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Sample:
        rng = np.random.default_rng((self.seed, index))
        out: Sample = {}
        for k in self.keys:
            if k == "patches":
                patches = np.zeros(
                    (self.num_patches, self.size, self.size, 3), np.float32)
                for p in range(self.num_patches):
                    t0, l0 = rng.integers(0, self.size - 16, 2)
                    patches[p, t0:t0 + 16, l0:l0 + 16] = rng.uniform(
                        0, 1, (16, 16, 3))
                out[k] = patches
            else:
                out[k] = rng.uniform(0, 1,
                                     (self.size, self.size, 3)).astype(
                    np.float32)
        return out
