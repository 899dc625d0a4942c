"""Runtime sanitizers for jit discipline (SURVEY.md §5 "race detection /
sanitizers" row).

The reference has no equivalent (torch eager hides these failure classes).
In a jit/XLA framework the real production hazards are different: silent
RETRACING (shape/dtype churn recompiles every step — the moral equivalent
of a perf race), ineffective BUFFER DONATION (doubles optimizer-state HBM),
and impure functions capturing tracers. These helpers make each one an
assertable property in tests and train-loop smoke checks.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax


class RetraceCounter:
    """Wrap a function before `jax.jit` to count how many times it is
    (re)traced. A steady-state train loop must trace exactly once per
    (shape, dtype) signature — more means something non-hashable or
    shape-unstable is sneaking into the carry.

        counter = RetraceCounter(step_fn)
        step = jax.jit(counter)
        ... run loop ...
        counter.assert_max(1)
    """

    def __init__(self, fn: Callable):
        self.fn = fn
        self.count = 0
        functools.update_wrapper(self, fn)

    def __call__(self, *args, **kwargs):
        self.count += 1
        return self.fn(*args, **kwargs)

    def assert_max(self, n: int) -> None:
        if self.count > n:
            raise AssertionError(
                f"{getattr(self.fn, '__name__', self.fn)} traced "
                f"{self.count} times (expected <= {n}) — check for "
                f"shape/dtype churn or unhashable static args")


def assert_donated(args_tree: Any) -> None:
    """Assert every array leaf of `args_tree` was actually donated (its
    buffer deleted) by a preceding `jax.jit(..., donate_argnums=...)` call.
    Ineffective donation (e.g. dtype mismatch between input and output)
    silently doubles peak HBM for the train state."""
    bad = []

    def visit(path, leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_deleted():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, args_tree)
    if bad:
        raise AssertionError(
            "donation ineffective for: " + ", ".join(bad[:8])
            + (" ..." if len(bad) > 8 else ""))


def assert_jit_pure(fn: Callable, *args, **kwargs) -> None:
    """Trace `fn` twice and assert the jaxprs match — catches functions
    whose trace depends on hidden mutable Python state (counters, RNGs,
    caches), which would make compiled behavior diverge from eager."""
    # fresh lambdas defeat jax's per-function tracing cache so the
    # function body really executes twice
    a = jax.make_jaxpr(lambda *a_, **k_: fn(*a_, **k_))(*args, **kwargs)
    b = jax.make_jaxpr(lambda *a_, **k_: fn(*a_, **k_))(*args, **kwargs)
    if str(a) != str(b):
        raise AssertionError(
            f"{getattr(fn, '__name__', fn)} traced to different jaxprs on "
            "consecutive traces — hidden mutable state in the function")
