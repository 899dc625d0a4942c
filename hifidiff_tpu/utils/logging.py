"""Observability: metrics logging + image-grid dumps + profiling hooks.

The reference logs through wandb (rank-0 gated, per-stage projects —
`train_cr.py:140-152` etc.), tqdm postfix, and `save_image` grids. Here:
a pluggable MetricsLogger (stdout + JSONL always; wandb only if installed
and requested) and a PIL-based grid writer. Profiling: `jax.profiler`
trace context (the reference has none — `ptflops` is pinned but never
imported, SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, project: str, run_name: str = "run",
                 use_wandb: bool = False, stdout_every: int = 50,
                 main_only: bool = True):
        """main_only: in multi-process runs, only process 0 writes
        (JSONL/stdout/wandb) — the reference's `accelerator.is_main_process`
        gating (`pretrain_denoiser.py:112-120`). Other processes become
        no-op loggers."""
        self.enabled = True
        if main_only:
            try:
                import jax

                self.enabled = jax.process_index() == 0
            except Exception:  # noqa: BLE001 — no jax -> single process
                pass
        if not self.enabled:
            self._f = None
            self._wandb = None
            self.stdout_every = 0
            return
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{project}.{run_name}.jsonl")
        self._f = open(self.path, "a")
        self.stdout_every = stdout_every
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, name=run_name)
            except ImportError:
                print("[logger] wandb not installed; JSONL/stdout only")

    def log(self, metrics: Dict, step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.stdout_every and step % self.stdout_every == 0:
            msg = " ".join(f"{k}={float(v):.5g}" for k, v in metrics.items())
            print(f"[step {step}] {msg}", flush=True)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def save_image_grid(images: np.ndarray, path: str,
                    nrow: Optional[int] = None, pad: int = 2) -> None:
    """(B, H, W, C) float [0,1] -> one grid PNG (save_image equivalent)."""
    from PIL import Image

    b, h, w, c = images.shape
    nrow = nrow or max(1, int(np.ceil(np.sqrt(b))))
    ncol = int(np.ceil(b / nrow))
    grid = np.zeros((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                    dtype=np.float32)
    for i in range(b):
        r, col = divmod(i, nrow)
        y0 = r * (h + pad) + pad
        x0 = col * (w + pad) + pad
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if c == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def side_by_side(*batches: np.ndarray) -> np.ndarray:
    """Concatenate same-shape NHWC batches horizontally per sample — the
    reference's `[input | pred | gt]` dump convention (`train_cr.py:83-91`)."""
    return np.concatenate(batches, axis=2)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-time tracker for train loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0
