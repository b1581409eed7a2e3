"""Subprocess body for PROCESS-spanning weak-scaling measurement.

Reuses the real `jax.distributed` runtime from the multihost test
(tests/integration/test_multihost.py): N OS processes x D virtual CPU
devices each are wired into one JAX cluster, `sharded_imhk_chains` runs
over the process-spanning global mesh with chains_per_device fixed (weak
scaling), and the primary process reports the measured throughput.

Usage:
    python -m lattice_gaussian_mcmc_tpu.experiments._process_scaling_worker \
        <coordinator> <num_processes> <process_id> <devices_per_proc> \
        <chains_per_device> <n_samples> <out_path>
"""

import json
import os
import sys
import time


def main() -> int:
    (coordinator, nproc, pid, dev_per_proc, chains_per_dev, n_samples,
     out_path) = sys.argv[1:8]
    nproc, pid = int(nproc), int(pid)
    dev_per_proc, chains_per_dev = int(dev_per_proc), int(chains_per_dev)
    n_samples = int(n_samples)

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dev_per_proc}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from lattice_gaussian_mcmc_tpu.parallel.runtime import (
        global_mesh,
        init_runtime,
        is_primary,
    )

    info = init_runtime(coordinator, nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
    from lattice_gaussian_mcmc_tpu.parallel.collectives import (
        sharded_imhk_chains,
    )
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    mesh = global_mesh()
    rng = np.random.default_rng(0)
    n = 16
    basis = np.triu(rng.uniform(-0.5, 0.5, (n, n))).astype(np.float32)
    np.fill_diagonal(basis, 1.0)
    lat = lattice_from_basis(basis)
    pre = klein_precompute(lat, 1.2)

    n_chains = chains_per_dev * info.n_global_devices
    key = jax.random.key(0)
    out = sharded_imhk_chains(key, pre, n_chains, n_samples, mesh)
    jax.block_until_ready(out)   # compile
    t0 = time.perf_counter()
    out = sharded_imhk_chains(jax.random.fold_in(key, 1), pre, n_chains,
                              n_samples, mesh)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    result = {
        "process_count": info.process_count,
        "n_global_devices": info.n_global_devices,
        "n_chains": n_chains,
        "samples_per_sec": n_chains * n_samples / dt,
        "acceptance": float(out[2]["acceptance_rate"]),
        "distributed": info.distributed,
    }
    if is_primary():
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
