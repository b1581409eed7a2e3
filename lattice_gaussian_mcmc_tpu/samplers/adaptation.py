"""Sigma / mixing-parameter adaptation for lattice Gaussian MCMC.

BASELINE config 4 names "symmetric Metropolis-Klein + sigma adaptation";
the reference's analogue is `adaptive_precision_sample`
(src/samplers/klein.py:273-302) plus the burn-in heuristics
(imhk.py:68-91). TPU-native design: adaptation runs on *windowed pooled
statistics* (acceptance rate or spectral-gap estimate psum'd across the
chain batch/mesh — SURVEY.md section 7 "MH acceptance under vmap"), driving
a Robbins-Monro update of log sigma between jitted step windows. The chain
kernel itself stays pure; only the (scalar) sigma changes between windows,
which re-specializes the precomputation cheaply.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.samplers.klein import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)


@dataclass
class AdaptationState:
    """Host-side adaptation bookkeeping."""

    log_sigma: float
    step: int = 0
    history: List[dict] = field(default_factory=list)

    @property
    def sigma(self) -> float:
        return math.exp(self.log_sigma)


def robbins_monro_update(state: AdaptationState, observed: float,
                         target: float, gain0: float = 0.5,
                         decay: float = 0.6) -> AdaptationState:
    """log sigma_{t+1} = log sigma_t + gamma_t (observed - target) with
    gamma_t = gain0 / (1 + t)^decay. For acceptance-targeting: acceptance
    increases with sigma (weights flatten), so the sign is positive when
    observed < target is to be corrected downward... we adapt
    log sigma += gamma * (target - observed) * (-1): IMHK acceptance
    *increases* with sigma, so to raise acceptance we raise sigma."""
    gamma = gain0 / (1.0 + state.step) ** decay
    new_log = state.log_sigma + gamma * (target - observed) * 1.0
    st = AdaptationState(log_sigma=new_log, step=state.step + 1,
                         history=state.history)
    return st


def adapt_sigma_imhk(key, lattice: Lattice, sigma0: float,
                     target_acceptance: float = 0.9,
                     n_windows: int = 12, window_steps: int = 4,
                     n_chains: int = 1024, block: int = 32,
                     sigma_floor: Optional[float] = None) -> AdaptationState:
    """Adapt sigma so pooled IMHK acceptance hits `target_acceptance`.

    Each window: re-specialize the Klein precomputation at the current
    sigma, run `window_steps` fused IMHK steps over the chain batch, pool
    acceptance (a jitted sum — with a mesh this is the psum path), update
    sigma by Robbins-Monro. Returns the adaptation state with history.
    """
    if sigma_floor is None:
        # Klein validity floor: below it the proposal is badly truncated
        sigma_floor = float(jnp.max(lattice.gs_norms)) / math.sqrt(
            2.0 * math.log(lattice.n + 1.0))
    st = AdaptationState(log_sigma=math.log(sigma0))
    for w in range(n_windows):
        sigma = max(st.sigma, sigma_floor)
        pre = klein_precompute(lattice, sigma)
        k_w = jax.random.fold_in(key, w)
        X0, lw0 = klein_sample_batch_blocked(k_w, pre, n_chains, block)
        _, _, acc = imhk_steps_batch_blocked(jax.random.fold_in(k_w, 1), pre,
                                             X0, lw0, window_steps, block)
        acc_rate = float(jnp.mean(acc)) / window_steps
        st.history.append({"window": w, "sigma": sigma,
                           "acceptance": acc_rate})
        st = robbins_monro_update(st, acc_rate, target_acceptance)
        st.log_sigma = max(st.log_sigma, math.log(sigma_floor))
    st.log_sigma = max(st.log_sigma, math.log(sigma_floor))
    return st


@partial(jax.jit, static_argnames=("n_steps",))
def _smk_window_xla(key, pre_hybrid, Q, R, X, n_steps: int):
    """`n_steps` vmapped XLA SMK steps on coeff state X (B, n); returns
    (X, accepted fraction). `pre_hybrid` carries proposal widths in
    .sigmas and the target width in .sigma (what `smk_step` expects)."""
    from lattice_gaussian_mcmc_tpu.samplers.imhk import ChainState, smk_step

    B = X.shape[0]
    zeros = jnp.zeros((B,), jnp.int32)
    st = ChainState(coeffs=X, log_w=jnp.zeros((B,), X.dtype),
                    accepted=zeros, steps=zeros)

    def body(i, st):
        k = jax.random.fold_in(key, i)
        keys = jax.vmap(lambda j: jax.random.fold_in(k, j))(jnp.arange(B))
        return jax.vmap(
            lambda kk, s: smk_step(kk, s, pre_hybrid, Q, R))(keys, st)

    st = jax.lax.fori_loop(0, n_steps, body, st)
    acc = jnp.sum(st.accepted).astype(jnp.float32) / (B * n_steps)
    return st.coeffs, acc


def adapt_sigma_smk(key, lattice: Lattice, sigma: float,
                    sigma_prop0: Optional[float] = None,
                    target_acceptance: float = 0.45,
                    n_windows: int = 16, window_steps: int = 8,
                    n_chains: int = 4096, backend: str = "auto",
                    tile: int = 0, grow_windows: bool = True,
                    warmup_windows: int = 4,
                    max_window_steps: int = 128) -> AdaptationState:
    """BASELINE config 4 adaptation: Robbins-Monro on the symmetric
    Metropolis-Klein PROPOSAL width, targeting pooled acceptance.

    SMK is a random-walk Metropolis chain, so the adapted parameter is the
    local-move width sigma_prop (the reference's analogue adapts precision
    between sampling passes, src/samplers/klein.py:273-302; classical RWM
    theory targets acceptance ~0.234-0.5). Acceptance DECREASES in
    sigma_prop, so the update is log sigma_prop += gamma (observed -
    target). Chain state persists across windows (diminishing adaptation —
    the standard construction that preserves ergodicity).

    backend "pallas" runs windows through the fused SMK kernel
    (ops/kernels/smk_pallas.py) — TPU only; "auto" picks it when available.
    Returns the AdaptationState; .history rows carry
    (window, sigma_prop, acceptance, window_steps, samples_per_sec).

    `grow_windows` (default on): after `warmup_windows` windows the
    per-window step count jumps ONCE to `max_window_steps` — the
    diminishing-adaptation construction (the Robbins-Monro gain
    gamma_t ~ t^-0.6 has already decayed by then, so late windows need
    estimate precision, not update frequency). A single jump rather than
    a doubling ramp because each DISTINCT step count is its own fused
    executable and the Mosaic remote compile (~20 s) is not disk-cached:
    two executables total keeps the compile cost bounded while the big
    windows run at kernel rate (VERDICT r4 next-step #5). The adapted
    fixed point is unchanged: chain state persists across windows and
    the update still targets pooled window acceptance.
    """
    import time as _time

    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        pallas_supported,
    )
    from lattice_gaussian_mcmc_tpu.ops.kernels.smk_pallas import (
        smk_steps_batch_pallas,
    )
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
        klein_sample_batch_blocked,
    )

    n = lattice.n
    if sigma_prop0 is None:
        sigma_prop0 = 2.38 * float(sigma) / math.sqrt(n)
    use_pallas = backend == "pallas" or (backend == "auto"
                                         and pallas_supported()
                                         and n_chains % 256 == 0)
    pre_t = klein_precompute(lattice, sigma)
    # init chains from a Klein draw at the target width
    X, _ = klein_sample_batch_blocked(jax.random.fold_in(key, 0xad), pre_t,
                                      n_chains, 32)
    X = X.astype(jnp.float32) if use_pallas else X
    st = AdaptationState(log_sigma=math.log(sigma_prop0))
    for w in range(n_windows):
        sp = st.sigma
        steps_w = window_steps
        if grow_windows and w >= warmup_windows:
            steps_w = max_window_steps
        k_w = jax.random.fold_in(key, w)
        t0 = _time.perf_counter()
        if use_pallas:
            X, acc = smk_steps_batch_pallas(k_w, pre_t, X, steps_w,
                                            sigma_prop=sp, tile=tile)
            # scalar pull forces completion (the tunneled device's
            # block_until_ready can return early — bench.py's note)
            acc_rate = float(jnp.sum(acc)) / (n_chains * steps_w)
        else:
            pre_h = pre_t.replace(
                sigmas=jnp.asarray(sp, pre_t.U.dtype) /
                jnp.diagonal(lattice.R))
            X, acc = _smk_window_xla(k_w, pre_h, lattice.Q, lattice.R, X,
                                     steps_w)
            acc_rate = float(acc)
        dt = _time.perf_counter() - t0
        st.history.append({
            "window": w, "sigma_prop": sp, "acceptance": acc_rate,
            "window_steps": steps_w, "window_s": dt,
            "samples_per_sec": n_chains * steps_w / max(dt, 1e-9),
        })
        gamma = 0.5 / (1.0 + st.step) ** 0.6
        st = AdaptationState(
            log_sigma=st.log_sigma + gamma * (acc_rate - target_acceptance),
            step=st.step + 1, history=st.history)
    return st


def dual_averaging_update(mu: float, log_sigma: float, h_sum: float,
                          t: int, target: float, observed: float,
                          gamma: float = 0.05, t0: float = 10.0,
                          kappa: float = 0.75) -> Tuple[float, float, float]:
    """Nesterov dual averaging (the NUTS-style step-size adapter, applied to
    log sigma): returns (new_log_sigma, new_h_sum, log_sigma_bar_weight).

    Sign note: NUTS adapts a step size whose acceptance *decreases* in the
    parameter (hence `mu - ...`); IMHK acceptance *increases* with sigma
    (larger sigma flattens the importance weights), so the correction is
    applied with the opposite sign: observed < target pushes log sigma UP.
    """
    h_sum = h_sum + (target - observed)
    log_sigma_new = mu + math.sqrt(t) / gamma * h_sum / (t + t0)
    eta = t ** (-kappa)
    return log_sigma_new, h_sum, eta


def estimate_burn_in_from_gap(delta: float, eps: float = 0.01,
                              cap: int = 100_000) -> int:
    """Burn-in from the spectral-gap bound t_mix < -ln(eps)/delta
    (reference imhk.py:68-91)."""
    return int(min(math.ceil(-math.log(eps) / max(delta, 1e-12)), cap))
