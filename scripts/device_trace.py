"""Capture a REAL device trace of the fused IMHK kernel and summarize
per-op time (VERDICT r3 weak #5: the kernel profile was ablation-
differencing with analytic MAC counts; this is the corroborating
`jax.profiler` trace).

Flow: jax.profiler.start_trace -> one fused dispatch (scalar-pulled) ->
stop_trace -> parse the xplane protobuf (tensorflow's XSpace) -> aggregate
event durations per op/name for the TPU device plane -> write
results/kernel_profile/trace_summary.json with the top rows and the
device-total vs wall-clock accounting, next to the ablation profile
(results/kernel_profile/profile.json) for reconciliation.
"""

import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402


def parse_xspace(logdir):
    """Aggregate event durations per (plane, event-name) from the captured
    xplane protobuf."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())
    planes = []
    for plane in xspace.planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                a = agg.setdefault(name, [0.0, 0])
                a[0] += dur
                a[1] += 1
        rows = sorted(
            ({"name": k, "total_s": v[0], "count": v[1]}
             for k, v in agg.items()),
            key=lambda r: -r["total_s"])
        planes.append({"plane": plane.name,
                       "total_event_s": sum(r["total_s"] for r in rows),
                       "top": rows[:25]})
    return planes


def main():
    import jax
    import jax.numpy as jnp
    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.lattices.qary import falcon_parameters
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas,
        klein_sample_batch_pallas,
    )
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    if jax.devices()[0].platform != "tpu":
        print("needs TPU", file=sys.stderr)
        return 2

    n_ring = int(os.environ.get("TRACE_N", "512"))
    B = int(os.environ.get("TRACE_CHAINS", "131072"))
    n_steps = int(os.environ.get("TRACE_STEPS", "32"))
    tile = int(os.environ.get("TRACE_TILE", "4096"))
    tau = float(os.environ.get("BENCH_TAU", "4.4"))

    lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                       dtype=jnp.float32)
    sigma = falcon_parameters(512)["sigma"]
    pre = klein_precompute(lat, sigma, tau=tau)
    key = jax.random.key(0)
    X, lw = klein_sample_batch_pallas(key, pre, B, tile=tile)
    # warm the fused executable so the trace sees steady-state execution
    X, lw, _ = imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre, X,
                                       lw, n_steps, tile=tile)
    float(jnp.sum(lw))

    logdir = tempfile.mkdtemp(prefix="jaxtrace_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    X, lw, _ = imhk_steps_batch_pallas(jax.random.fold_in(key, 2), pre, X,
                                       lw, n_steps, tile=tile)
    float(jnp.sum(lw))
    jax.profiler.stop_trace()
    wall_s = time.perf_counter() - t0

    planes = parse_xspace(logdir)
    payload = {
        "config": {"n_ring": n_ring, "dim": 2 * n_ring, "B": B,
                   "n_steps": n_steps, "tile": tile, "tau": tau,
                   "window": int(pre.window)},
        "wall_s_including_trace_overhead": round(wall_s, 3),
        "samples": B * n_steps,
        "planes": planes,
        "note": ("durations are trace-event sums per op name; the TPU "
                 "device plane rows are the real per-kernel times to "
                 "reconcile against the ablation shares in profile.json"),
    }
    out_dir = os.path.join(REPO, "results", "kernel_profile")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "trace_summary.json"), "w") as f:
        json.dump(payload, f, indent=2, default=float)
    for p in planes:
        print(f"== {p['plane']}: total {p['total_event_s']:.3f}s")
        for r in p["top"][:8]:
            print(f"   {r['total_s']:.3f}s x{r['count']}  {r['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
