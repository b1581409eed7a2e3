"""Subprocess body for the multi-process (multi-"host") runtime test.

Each process initializes the distributed runtime over a local CPU cluster
(N virtual devices per process), builds the process-spanning global mesh,
runs `sharded_imhk_chains` UNCHANGED over it, gathers the chain outputs, and
writes a digest. tests/integration/test_multihost.py spawns two of these and
checks the digest is bitwise identical to a single-process run — the
mesh-/process-layout independence guarantee of the fold_in PRNG discipline.

Usage:
    python -m lattice_gaussian_mcmc_tpu.parallel._multihost_worker \
        <coordinator> <num_processes> <process_id> <devices_per_proc> <out>
"""

import hashlib
import json
import os
import sys


def main() -> int:
    coordinator, nproc, pid, dev_per_proc, out_path = sys.argv[1:6]
    nproc, pid, dev_per_proc = int(nproc), int(pid), int(dev_per_proc)

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dev_per_proc}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from lattice_gaussian_mcmc_tpu.parallel.runtime import (
        all_processes_array,
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
    n = 6
    basis = np.triu(rng.integers(-2, 3, (n, n))).astype(np.float64)
    np.fill_diagonal(basis, 3.0)
    lat = lattice_from_basis(basis)
    pre = klein_precompute(lat, 4.0)

    coeffs, log_ws, stats = sharded_imhk_chains(
        jax.random.key(0), pre, n_chains=16, n_samples=5, mesh=mesh,
        thin=1, burn_in=2)
    jax.block_until_ready((coeffs, log_ws, stats))

    full = all_processes_array(coeffs)
    digest = hashlib.sha256(np.ascontiguousarray(full).tobytes()).hexdigest()
    result = {
        "digest": digest,
        "acceptance": float(stats["acceptance_rate"]),
        "process_count": info.process_count,
        "process_index": info.process_index,
        "n_global_devices": info.n_global_devices,
        "distributed": info.distributed,
    }
    if is_primary():
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
