"""Tracing / metrics (SURVEY.md section 5 "Tracing/profiling").

The reference embeds wall-clock stats in samplers (SamplingStats,
src/samplers/base.py:18-28) and measures RSS via getrusage. TPU equivalents:
`jax.profiler` trace context + a metrics struct computed from jitted runs
(samples/s, ESS/s, acceptance), plus compiled-HLO cost introspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Dict, Optional


@dataclasses.dataclass
class SamplingStats:
    """Mirror of the reference's SamplingStats, plus ESS-rate fields."""

    samples_generated: int = 0
    time_elapsed: float = 0.0
    acceptance_rate: float = 0.0
    ess: float = 0.0

    @property
    def samples_per_second(self) -> float:
        return self.samples_generated / self.time_elapsed if self.time_elapsed else 0.0

    @property
    def ess_per_second(self) -> float:
        return self.ess / self.time_elapsed if self.time_elapsed else 0.0

    def as_dict(self) -> Dict[str, float]:
        return {**dataclasses.asdict(self),
                "samples_per_second": self.samples_per_second,
                "ess_per_second": self.ess_per_second}


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(stats: SamplingStats, n_samples: int):
    """Accumulate wall-clock + sample count into a SamplingStats."""
    import jax
    t0 = time.perf_counter()
    yield
    # caller must block on results before exit for accurate numbers
    stats.time_elapsed += time.perf_counter() - t0
    stats.samples_generated += n_samples


def memory_snapshot() -> Dict[str, Any]:
    """Host RSS + device memory stats (reference measures RSS via
    `resource.getrusage`, experiments/dimension_scaling.py:768-797; on TPU
    the interesting number is peak HBM from device memory_stats)."""
    out: Dict[str, Any] = {}
    try:
        import resource
        # ru_maxrss is KiB on Linux
        out["peak_rss_mb"] = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:  # pragma: no cover - non-POSIX
        pass
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        for src, dst in (("bytes_in_use", "device_bytes_in_use"),
                         ("peak_bytes_in_use", "device_peak_bytes_mb"),
                         ("bytes_limit", "device_bytes_limit_mb")):
            if src in stats:
                v = stats[src]
                out[dst] = v / 1e6 if dst.endswith("_mb") else v
    except Exception:
        pass
    return out


def compiled_cost(fn, *args) -> Dict[str, Any]:
    """FLOP/bytes estimate from the compiled executable's cost analysis."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {"flops": ca.get("flops"),
                "bytes_accessed": ca.get("bytes accessed"),
                "transcendentals": ca.get("transcendentals")}
    except Exception:
        return {}
