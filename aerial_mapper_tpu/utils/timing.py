"""Per-stage wall-clock timing + throughput counters.

Replaces the reference's ad-hoc ``ros::Time::now()`` deltas logged via VLOG
(``dsm.cc:56,108-110``, ``ortho-backward-grid.cc:55,123-125`` — SURVEY.md §5
"Tracing / profiling"). HONESTY NOTE: under JAX's async dispatch the
``stage`` context measures host-side DISPATCH wall-clock of the block —
useful as a coarse per-stage diagnostic, NOT as a kernel timing (and on the
axon tunnel even ``block_until_ready`` does not reliably block, CLAUDE.md).
Authoritative device timings come from bench.py's drained, k-differenced
min-window methodology; for deep profiles use ``jax.profiler.trace``.
``time_fn`` additionally blocks on the produced arrays, which is sufficient
on ordinary backends.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger("aerial_mapper_tpu")


def block_until_ready_tree(tree):
    """Block on every array in a pytree (async-dispatch-safe timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


class StageTimer:
    """Collects named stage durations and optional work counts."""

    def __init__(self):
        self.durations: Dict[str, float] = {}
        self.work: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, work_items: Optional[float] = None):
        # (a result_tree parameter existed here but was unusable: it bound
        # at __enter__, before the block produced its arrays, and had no
        # callers — removed in round 4. Use time_fn to block on results.)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if work_items is not None:
                self.work[name] = self.work.get(name, 0.0) + work_items
            logger.info("dt(%s): %.4f s", name, dt)

    def time_fn(self, name: str, fn, *args, work_items=None, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        block_until_ready_tree(out)
        dt = time.perf_counter() - t0
        self.durations[name] = self.durations.get(name, 0.0) + dt
        if work_items is not None:
            self.work[name] = self.work.get(name, 0.0) + work_items
        return out

    def throughput(self, name: str) -> Optional[float]:
        """items/s for a stage (e.g. Mcells/s when work is in Mcells)."""
        if name in self.work and self.durations.get(name, 0.0) > 0:
            return self.work[name] / self.durations[name]
        return None

    def report(self) -> str:
        lines = ["stage timings:"]
        for name, dt in sorted(self.durations.items()):
            tp = self.throughput(name)
            extra = f"  ({tp:.2f} items/s)" if tp else ""
            lines.append(f"  {name}: {dt:.4f} s{extra}")
        return "\n".join(lines)


def config_banner(name: str, cfg) -> str:
    """Render a config dataclass as the reference's parameter banner
    (utils::paramToString, utils-common.cc:12-38; printed by dsm.cc:203-214
    and ortho-backward-grid.cc:241-253)."""
    import dataclasses

    lines = ["*" * 50, f"{name} parameters:"]
    if dataclasses.is_dataclass(cfg):
        for f in dataclasses.fields(cfg):
            lines.append(f"  {f.name}: {getattr(cfg, f.name)}")
    else:
        lines.append(f"  {cfg}")
    lines.append("*" * 50)
    return "\n".join(lines)


def log_config(name: str, cfg) -> None:
    logger.info("%s", config_banner(name, cfg))
