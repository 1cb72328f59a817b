"""Tracing / profiling utilities (SURVEY.md §7.1).

The reference's observability was wall-clock prints [R]; here:
  * `PhaseTimer` — `block_until_ready`-accurate host timers per phase
    (assembly / PCG / total), accumulated into a dict for the structured
    convergence records (§7.5).
  * `trace_region` — context manager wrapping `jax.profiler.trace` +
    `jax.named_scope`, dumping a perfetto trace under bench/traces/.
  * `compiled_cost` — XLA cost analysis (flops / bytes) of a jitted
    function at given example args, for roofline accounting.
"""

from __future__ import annotations

import contextlib
import pathlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock timer keyed by phase name."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *sync):
        """Time a phase; pass device values in `sync` to block on before
        stopping the clock (otherwise async dispatch hides the cost)."""
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        for v in sync:
            jax.block_until_ready(v)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name]}
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def trace_region(out_dir="bench/traces"):
    """Dump a perfetto/tensorboard trace of the enclosed device work."""
    path = pathlib.Path(out_dir)
    path.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(path)):
        yield path


def compiled_cost(fn, *args, **kwargs) -> dict:
    """Compile `fn` for the given args and return XLA's cost analysis
    (flops, bytes accessed, ...) — the per-kernel cost ledger of §7.1."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # one entry per computation
        analysis = analysis[0] if analysis else {}
    return dict(analysis or {})
