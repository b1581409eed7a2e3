"""BKZ reduction-quality artifact: GS profile + root-Hermite factor vs the
GSA prediction for beta in {20, 30, 40} on a q-ary n=128 lattice.

VERDICT r2 missing #3 follow-up: with general insertion in place
(reduction/cpp/lattice_reduce.cpp `insert_combination` — no enumeration
solution is ever skipped), the achieved basis quality must track the
Geometric Series Assumption: the root-Hermite factor
delta_0 = (||b_1|| / det^{1/n})^{1/n} of a BKZ-beta basis should land near
the model delta_0(beta) (reference security model, qary.py:194-262; our
`_root_hermite`). Writes results/reduction/bkz_quality.json; exits nonzero
if any measured delta_0 deviates from the model by more than the gate.

Note on the gate: at n=128 and beta<=40 the asymptotic delta_0(beta) model
carries real small-dimension noise (fplll's own experiments show ~1-2%
spread); the gate is |delta_measured/delta_model - 1| <= 0.02 plus
monotonicity (delta_0 non-increasing in beta within noise).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def root_hermite(basis_cols: np.ndarray) -> float:
    n = basis_cols.shape[0]
    # b_1 = the SHORTEST basis vector (BKZ guarantees quality of b_1; we
    # measure the min over columns to be layout-robust)
    b1 = float(np.min(np.linalg.norm(basis_cols.astype(float), axis=0)))
    logdet = float(np.linalg.slogdet(basis_cols.astype(float))[1])
    return (b1 / math.exp(logdet / n)) ** (1.0 / n)


def main() -> int:
    from lattice_gaussian_mcmc_tpu.lattices.qary import (
        _root_hermite,
        qary_basis,
    )
    from lattice_gaussian_mcmc_tpu.reduction import (
        bkz_reduce,
        lll_reduce,
        native_available,
    )

    if not native_available():
        print("ERROR: native reduction library unavailable", file=sys.stderr)
        return 2

    n = int(os.environ.get("BKZQ_N", "128"))
    q = 3329
    rng = np.random.default_rng(0)
    # (k, m) = (n/2, n/2) modular constraints -> a dim-n q-ary basis
    A = rng.integers(0, q, size=(n // 2, n // 2))
    B = qary_basis(A, q)
    t0 = time.perf_counter()
    L = lll_reduce(B)
    t_lll = time.perf_counter() - t0

    rows = [{
        "reduction": "lll",
        "seconds": t_lll,
        "delta0_measured": root_hermite(L),
        "delta0_model": 1.0219,  # classical LLL experimental constant
        "gs_profile": list(map(float, np.abs(np.diag(
            np.linalg.qr(L.astype(float))[1])))),
    }]

    R = L
    all_ok = True
    for beta in (20, 30, 40):
        t0 = time.perf_counter()
        R = bkz_reduce(R, beta=beta, max_tours=8)
        dt = time.perf_counter() - t0
        d_meas = root_hermite(R)
        d_model = _root_hermite(beta)
        rel = d_meas / d_model - 1.0
        gs = np.abs(np.diag(np.linalg.qr(R.astype(float))[1]))
        # GSA slope: log||b*_i|| ~ const - i * log(delta0^2)
        slope = float(np.polyfit(np.arange(n), np.log(gs), 1)[0])
        gsa_slope = -2.0 * math.log(d_model)
        passed = bool(abs(rel) <= 0.02)
        all_ok &= passed
        rows.append({
            "reduction": f"bkz-{beta}",
            "seconds": dt,
            "delta0_measured": d_meas,
            "delta0_model": d_model,
            "rel_deviation": rel,
            "gsa_slope_measured": slope,
            "gsa_slope_model": gsa_slope,
            "gs_profile": list(map(float, gs)),
            "passed": passed,
        })
        print(f"bkz-{beta}: delta0 {d_meas:.5f} vs model {d_model:.5f} "
              f"({100*rel:+.2f}%) in {dt:.1f}s "
              f"[{'PASS' if passed else 'FAIL'}]", flush=True)

    # delta_0 must improve (or hold) with beta
    deltas = [r["delta0_measured"] for r in rows[1:]]
    monotone = all(deltas[i + 1] <= deltas[i] + 5e-4
                   for i in range(len(deltas) - 1))
    payload = {"n": n, "q": q, "rows": rows,
               "monotone_in_beta": bool(monotone),
               "all_passed": bool(all_ok and monotone)}
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "reduction")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "bkz_quality.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(f"all_passed: {payload['all_passed']}")
    return 0 if payload["all_passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
