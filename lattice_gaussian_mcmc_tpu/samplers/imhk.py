"""Independent Metropolis-Hastings-Klein (IMHK) and symmetric
Metropolis-Klein MCMC — fused TPU step.

Parity: reference `src/samplers/imhk.py` (IMHKSampler): theoretical burn-in
t_mix < -ln(eps)/delta (:68-91), importance weight in log space (:102-124),
MH step (:141-177), `sample(n, thin)` (:196-229), `run_chain` (:231-250),
MC spectral-gap estimate (:252-284), `diagnose_convergence` (:286-313).
The symmetric Metropolis-Klein chain is the Wang-Ling variant the BASELINE
north star names (Klein proposal centered at the current state).

TPU-native design (SURVEY.md section 3.2 "TPU mapping"): one fused step =
Klein-propose + weight + MH accept under `lax.scan` over time, `vmap` over
chains. The importance weight log w(y) = sum_i log Z_i falls out of the Klein
scan (see samplers/klein.py), so an IMHK step costs exactly one Klein draw
plus O(1) — versus the reference's propose + full density re-evaluation
(~2x Klein per step, SURVEY section 3.2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    KleinPrecomp,
    klein_precompute,
    klein_sample,
    klein_log_weight,
    klein_points,
)
from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys
from lattice_gaussian_mcmc_tpu.utils.stats import logmeanexp


@flax.struct.dataclass
class ChainState:
    """Per-chain MCMC state: a tiny pytree (SURVEY section 5 checkpoint/resume:
    (coeffs, log_w, counters) is all that needs to persist)."""

    coeffs: jnp.ndarray      # (n,) integer-valued float coefficients
    log_w: jnp.ndarray       # scalar: log importance weight of current state
    accepted: jnp.ndarray    # scalar int32: accepted proposals
    steps: jnp.ndarray       # scalar int32: total proposals


def imhk_init(key: jax.Array, pre: KleinPrecomp) -> ChainState:
    """Initialize a chain from one Klein draw (reference imhk.py:126-139)."""
    coeffs, log_w = klein_sample(key, pre)
    return ChainState(coeffs=coeffs, log_w=log_w,
                      accepted=jnp.int32(0), steps=jnp.int32(0))


def imhk_step(key: jax.Array, state: ChainState, pre: KleinPrecomp) -> ChainState:
    """One IMHK step: propose y ~ Klein, accept with min(1, w(y)/w(x))."""
    k_prop, k_acc = jax.random.split(key)
    y, log_w_y = klein_sample(k_prop, pre)
    log_ratio = log_w_y - state.log_w
    u = jax.random.uniform(k_acc, dtype=log_ratio.dtype,
                           minval=jnp.finfo(log_ratio.dtype).tiny)
    accept = jnp.log(u) < log_ratio  # min(0, .) implicit: log u < 0 always
    coeffs = jnp.where(accept, y, state.coeffs)
    log_w = jnp.where(accept, log_w_y, state.log_w)
    return ChainState(coeffs=coeffs, log_w=log_w,
                      accepted=state.accepted + accept.astype(jnp.int32),
                      steps=state.steps + 1)


@partial(jax.jit, static_argnames=("n_samples", "thin", "burn_in"))
def imhk_chain(key: jax.Array, pre: KleinPrecomp, n_samples: int,
               thin: int = 1, burn_in: int = 0):
    """Run one IMHK chain: returns (coeffs (T, n), log_ws (T,), final_state).

    Structure: burn-in fori_loop (nothing recorded), then scan of n_samples
    outer steps each doing `thin` inner steps (reference sample(N, thin),
    imhk.py:196-229).
    """
    k_init, k_run = jax.random.split(key)
    state = imhk_init(k_init, pre)

    def one_step(state, k):
        return imhk_step(k, state, pre)

    def burn_body(i, st):
        return one_step(st, jax.random.fold_in(k_run, i))

    state = jax.lax.fori_loop(0, burn_in, burn_body, state)

    def outer(state, t):
        def inner(j, st):
            return one_step(st, jax.random.fold_in(k_run, burn_in + t * thin + j))
        state = jax.lax.fori_loop(0, thin, inner, state)
        return state, (state.coeffs, state.log_w)

    state, (coeffs, log_ws) = jax.lax.scan(outer, state, jnp.arange(n_samples))
    return coeffs, log_ws, state


@partial(jax.jit, static_argnames=("n_chains", "n_samples", "thin", "burn_in"))
def imhk_chains(key: jax.Array, pre: KleinPrecomp, n_chains: int,
                n_samples: int, thin: int = 1, burn_in: int = 0):
    """vmap over chains: coeffs (C, T, n), log_ws (C, T), states (C,)."""
    keys = chain_keys(key, n_chains)
    return jax.vmap(lambda k: imhk_chain(k, pre, n_samples, thin, burn_in))(keys)


# ---------------------------------------------------------------------------
# Symmetric Metropolis-Klein: Klein proposal centered at the current point.
# ---------------------------------------------------------------------------


def smk_step(key: jax.Array, state: ChainState, pre: KleinPrecomp,
             lattice_Q, lattice_R) -> ChainState:
    """One symmetric Metropolis-Klein step.

    Proposal: y ~ Klein(center = B x) with width pre.sigma. Acceptance uses
    the full MH ratio  pi(y) q(x|y) / (pi(x) q(y|x)); both cross densities
    are parallel evaluations (klein_log_weight with a recentered precomp).
    In log-weight form: alpha = min(1, exp(lw_c(y at x) ... )) — we compute
    directly:  log pi~(z) = -||B z - c||^2 / (2 sigma^2)  plus
    log q(z | center m) from the recentered Klein density.
    """
    n = pre.n
    r_diag = jnp.diagonal(lattice_R)
    k_prop, k_acc = jax.random.split(key)

    x = state.coeffs
    # recenter the Klein proposal at the current lattice point
    hp = jax.lax.Precision.HIGHEST
    point_x = jnp.dot(pre.basis, x, precision=hp)
    cs_x = jnp.dot(lattice_Q.T, point_x, precision=hp) / r_diag
    pre_x = pre.replace(cs=cs_x)
    y, _ = klein_sample(k_prop, pre_x)

    point_y = jnp.dot(pre.basis, y, precision=hp)
    cs_y = jnp.dot(lattice_Q.T, point_y, precision=hp) / r_diag
    pre_y = pre.replace(cs=cs_y)

    from lattice_gaussian_mcmc_tpu.samplers.klein import klein_log_density
    log_q_y_given_x = klein_log_density(y, pre_x)
    log_q_x_given_y = klein_log_density(x, pre_y)

    # target pi ~ exp(-||B z - c||^2 / (2 sigma^2)); pre.cs holds the target
    # center in scaled-QR coordinates: ||B z - c||^2 = sum (r_i (z - c))^2
    def log_pi(z, cs_target):
        resid = (jnp.dot(pre.U, z, precision=hp) - cs_target) * r_diag
        return -0.5 * jnp.sum(resid * resid) / (pre.sigma ** 2)

    log_ratio = (log_pi(y, pre.cs) + log_q_x_given_y
                 - log_pi(x, pre.cs) - log_q_y_given_x)
    u = jax.random.uniform(k_acc, dtype=log_ratio.dtype,
                           minval=jnp.finfo(log_ratio.dtype).tiny)
    accept = jnp.log(u) < log_ratio
    coeffs = jnp.where(accept, y, x)
    return ChainState(coeffs=coeffs, log_w=state.log_w,
                      accepted=state.accepted + accept.astype(jnp.int32),
                      steps=state.steps + 1)


@partial(jax.jit, static_argnames=("n_samples", "thin", "burn_in"))
def smk_chain(key: jax.Array, pre: KleinPrecomp, lattice_Q, lattice_R,
              n_samples: int, thin: int = 1, burn_in: int = 0):
    """Symmetric Metropolis-Klein chain (same harness as imhk_chain)."""
    k_init, k_run = jax.random.split(key)
    state = imhk_init(k_init, pre)

    def one_step(st, k):
        return smk_step(k, st, pre, lattice_Q, lattice_R)

    state = jax.lax.fori_loop(
        0, burn_in, lambda i, st: one_step(st, jax.random.fold_in(k_run, i)),
        state)

    def outer(st, t):
        def inner(j, s):
            return one_step(s, jax.random.fold_in(k_run, burn_in + t * thin + j))
        st = jax.lax.fori_loop(0, thin, inner, st)
        return st, st.coeffs

    state, coeffs = jax.lax.scan(outer, state, jnp.arange(n_samples))
    return coeffs, state


# ---------------------------------------------------------------------------
# Theory helpers (reference imhk.py:68-91, :252-284).
# ---------------------------------------------------------------------------


def estimate_burn_in(delta, eps: float = 0.01, cap: int = 10_000) -> int:
    """t_mix(eps) < -ln(eps) / delta (exponential uniform ergodicity)."""
    d = max(float(delta), 1e-12)
    return int(min(math.ceil(-math.log(eps) / d), cap))


def spectral_gap_mc(log_ws) -> jax.Array:
    """Monte-Carlo spectral-gap estimate from Klein-proposal log weights:
    delta >= 1/max w with w normalized; self-normalizing form
    delta_hat = mean(w~) / max(w~) = exp(logmeanexp - max)."""
    lw = jnp.ravel(log_ws)
    return jnp.exp(logmeanexp(lw) - jnp.max(lw))


class IMHKSampler:
    """OO wrapper mirroring the reference IMHKSampler surface."""

    def __init__(self, lattice: Lattice, sigma: float, center=None,
                 window: Optional[int] = None, burn_in: Optional[int] = None):
        self.lattice = lattice
        self.sigma = float(sigma)
        self.pre = klein_precompute(lattice, sigma, center, window)
        self.burn_in = burn_in if burn_in is not None else self._auto_burn_in()

    def _auto_burn_in(self) -> int:
        # quick MC gap estimate with a small Klein batch (host decision)
        from lattice_gaussian_mcmc_tpu.samplers.klein import klein_sample_batch
        _, lw = klein_sample_batch(jax.random.key(0), self.pre, 256)
        delta = float(spectral_gap_mc(lw))
        return estimate_burn_in(delta)

    def sample(self, key, num_samples: int, thin: int = 1, n_chains: int = 1,
               return_coeffs: bool = False, backend: str = "auto"):
        """Returns (num_samples*n_chains, n) lattice points (or coeffs).

        Always trajectory semantics: `num_samples` sequential (thinned)
        states per chain, so time-series diagnostics (ACF, tau_int, ESS) on
        the output are meaningful and `_last_state` supports chain resume
        (reference imhk.py:196-229 `sample(N, thin)`).

        backend "auto"/"xla" run the lax.scan paths. backend "pallas" runs
        the trajectory-mode fused kernel (ops/kernels/klein_pallas.py
        `imhk_trajectory_pallas`): every thin-th state is DMA'd to an HBM
        ring from inside the fused step loop, so the trajectory contract
        holds at fused-kernel speed (>1M samples/s at dim 1024). It
        requires a TPU and n_chains divisible by 256.
        """
        if backend == "pallas":
            return self._sample_pallas_trajectory(key, num_samples, thin,
                                                  n_chains, return_coeffs)
        if backend not in ("auto", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        if n_chains == 1:
            coeffs, log_ws, state = imhk_chain(key, self.pre, num_samples,
                                               thin, self.burn_in)
            coeffs = coeffs.reshape(-1, self.lattice.n)
            self._last_state = state
        else:
            coeffs, log_ws, state = imhk_chains(key, self.pre, n_chains,
                                                num_samples, thin, self.burn_in)
            coeffs = coeffs.reshape(-1, self.lattice.n)
            self._last_state = state
        self.acceptance_rate = float(jnp.sum(state.accepted) /
                                     jnp.maximum(jnp.sum(state.steps), 1))
        if return_coeffs:
            return coeffs
        return klein_points(self.pre.basis, coeffs)

    def _sample_pallas_trajectory(self, key, num_samples: int, thin: int,
                                  n_chains: int, return_coeffs: bool):
        """Trajectory semantics on the fused Pallas kernel: burn-in via the
        state-only fused path, then `num_samples` kept states per chain
        emitted every `thin` steps from inside one dispatch."""
        from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
            imhk_steps_batch_pallas,
            imhk_trajectory_pallas,
            klein_sample_batch_pallas,
            pallas_supported,
        )
        if not pallas_supported():
            raise RuntimeError("backend='pallas' requires a TPU backend")
        tile = max((t for t in (256, 512, 1024, 2048, 4096)
                    if n_chains % t == 0), default=0)
        if tile == 0:
            raise ValueError(
                f"backend='pallas' needs n_chains divisible by 256, got "
                f"{n_chains}")
        k0, k1, k2 = jax.random.split(jax.random.fold_in(key, 0x77), 3)
        X, lw = klein_sample_batch_pallas(k0, self.pre, n_chains, tile=tile)
        acc = jnp.zeros((n_chains,), jnp.float32)
        if self.burn_in > 0:
            X, lw, _ = imhk_steps_batch_pallas(k1, self.pre, X, lw,
                                               self.burn_in, tile=tile)
            acc = jnp.zeros((n_chains,), jnp.float32)
        X, lw, acc, traj, tlw = imhk_trajectory_pallas(
            k2, self.pre, X, lw, acc, n_keep=num_samples, thin=thin,
            tile=tile, traj_coeffs=True)
        self.acceptance_rate = float(jnp.sum(acc) /
                                     (n_chains * num_samples * thin))
        self._last_state = ChainState(
            coeffs=X, log_w=lw,
            accepted=acc.astype(jnp.int32),
            steps=jnp.full((n_chains,), num_samples * thin, jnp.int32))
        # traj: (n_keep, B, n) -> chain-major (B*n_keep, n) like the XLA path
        coeffs = traj.transpose(1, 0, 2).reshape(-1, self.lattice.n)
        if return_coeffs:
            return coeffs
        return klein_points(self.pre.basis, coeffs)

    def sample_iid(self, key, num_samples: int, n_steps: Optional[int] = None,
                   return_coeffs: bool = False, backend: str = "auto"):
        """Run `num_samples` INDEPENDENT chains, advance each `n_steps`
        (default burn_in) IMHK steps, return the final states.

        This is the fused-Pallas fast path (~7M steps/s on NTRU-512 on one
        v5e chip). The output is an i.i.d.-like batch — strictly better ESS
        than a trajectory at equal step count, but meaningless for
        autocorrelation/tau_int diagnostics; `_last_state` is set to None
        because there is no single chain to resume. backend "auto" falls
        back to a vmapped XLA scan off-TPU or for non-tileable batches;
        backend "pallas" raises instead of silently falling back.
        """
        from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
            imhk_steps_batch_pallas,
            klein_sample_batch_pallas,
            pallas_supported,
        )
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        n_steps = self.burn_in if n_steps is None else int(n_steps)
        n_steps = max(1, n_steps)
        tile = max((t for t in (256, 512, 1024, 2048, 4096)
                    if num_samples % t == 0), default=0)
        if backend == "pallas" and not pallas_supported():
            raise RuntimeError("backend='pallas' requires a TPU backend")
        if backend == "pallas" and tile == 0:
            raise ValueError(
                f"backend='pallas' needs num_samples divisible by 256, got "
                f"{num_samples}; pad the batch or use backend='xla'")
        if backend == "xla" or tile == 0 or not pallas_supported():
            # burn_in = n_steps-1 plus the single recorded thin step
            # = n_steps post-init IMHK steps, matching the kernel path.
            coeffs, _, state = imhk_chains(key, self.pre, num_samples,
                                           n_samples=1, thin=1,
                                           burn_in=n_steps - 1)
            coeffs = coeffs.reshape(num_samples, self.lattice.n)
            self.acceptance_rate = float(jnp.sum(state.accepted) /
                                         jnp.maximum(jnp.sum(state.steps), 1))
            self._last_state = None
            if return_coeffs:
                return coeffs
            return klein_points(self.pre.basis, coeffs)
        k0, k1 = jax.random.split(jax.random.fold_in(key, 0x9a11a5))
        coeffs, lw = klein_sample_batch_pallas(k0, self.pre, num_samples,
                                               tile=tile)
        coeffs, lw, acc = imhk_steps_batch_pallas(k1, self.pre, coeffs, lw,
                                                  n_steps, tile=tile)
        self.acceptance_rate = float(jnp.sum(acc) /
                                     (num_samples * n_steps))
        self._last_state = None
        if return_coeffs:
            return coeffs
        return klein_points(self.pre.basis, coeffs)

    def estimate_spectral_gap(self, key, num_samples: int = 1000) -> float:
        from lattice_gaussian_mcmc_tpu.samplers.klein import klein_sample_batch
        _, lw = klein_sample_batch(key, self.pre, num_samples)
        return float(spectral_gap_mc(lw))

    def diagnose_convergence(self, key, num_samples: int = 1000) -> dict:
        import time
        t0 = time.perf_counter()
        pts = self.sample(key, num_samples)
        pts.block_until_ready()
        dt = time.perf_counter() - t0
        return {
            "acceptance_rate": self.acceptance_rate,
            "spectral_gap_estimate": self.estimate_spectral_gap(
                jax.random.fold_in(key, 1), min(num_samples, 1000)),
            "empirical_mean": jnp.mean(pts, axis=0),
            "empirical_std": jnp.std(pts, axis=0),
            "theoretical_std": self.sigma * jnp.ones(self.lattice.n),
            "samples_per_second": num_samples / dt,
        }


class MetropolisKleinSampler:
    """Symmetric Metropolis-Klein wrapper (local Klein proposal).

    The proposal is a Klein draw of width `proposal_sigma` centered at the
    CURRENT lattice point; the acceptance uses the full MH ratio (the
    Wang-Ling symmetric variant named by BASELINE config 4). Two backends:
    the `lax.scan` chain (`sample`, trajectory semantics) and the fused
    Pallas kernel (`sample_iid`, ops/kernels/smk_pallas.py — one dispatch
    runs every step with the chain state VMEM-resident).
    """

    def __init__(self, lattice: Lattice, sigma: float, proposal_sigma=None,
                 center=None, window: Optional[int] = None):
        self.lattice = lattice
        self.sigma = float(sigma)
        psigma = proposal_sigma if proposal_sigma is not None else sigma
        self.proposal_sigma = float(psigma)
        # target precomp (used by the Pallas kernel, which takes the
        # proposal width separately) ...
        self._target_pre = klein_precompute(lattice, sigma, center, window)
        # ... and the XLA-path hybrid: proposal widths in .sigmas, target
        # width in .sigma (what smk_step expects)
        self.pre = self._target_pre.replace(
            sigmas=jnp.asarray(psigma) / jnp.diagonal(lattice.R))
        self._Q, self._R = lattice.Q, lattice.R

    def sample(self, key, num_samples: int, thin: int = 1,
               burn_in: int = 0, return_coeffs: bool = False):
        coeffs, state = smk_chain(key, self.pre, self._Q, self._R,
                                  num_samples, thin, burn_in)
        self.acceptance_rate = float(state.accepted / jnp.maximum(state.steps, 1))
        if return_coeffs:
            return coeffs
        return klein_points(self.pre.basis, coeffs)

    def sample_iid(self, key, num_samples: int, n_steps: int = 64,
                   return_coeffs: bool = False, backend: str = "auto"):
        """Run `num_samples` independent SMK chains `n_steps` steps each
        from a Klein initialization; return the final states.

        backend "pallas" uses the fused SMK kernel (requires TPU and
        num_samples divisible by 256); "auto" falls back to the vmapped
        XLA scan otherwise.
        """
        from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
            klein_sample_batch_pallas,
            pallas_supported,
        )
        from lattice_gaussian_mcmc_tpu.ops.kernels.smk_pallas import (
            smk_steps_batch_pallas,
        )
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        n_steps = max(1, int(n_steps))
        tile = max((t for t in (256, 512, 1024, 2048, 4096)
                    if num_samples % t == 0), default=0)
        if backend == "pallas" and not pallas_supported():
            raise RuntimeError("backend='pallas' requires a TPU backend")
        if backend == "pallas" and tile == 0:
            raise ValueError(
                f"backend='pallas' needs num_samples divisible by 256, got "
                f"{num_samples}")
        if backend == "xla" or tile == 0 or not pallas_supported():
            keys = chain_keys(key, num_samples)
            coeffs, states = jax.vmap(
                lambda k: smk_chain(k, self.pre, self._Q, self._R,
                                    n_samples=1, thin=1,
                                    burn_in=n_steps - 1))(keys)
            coeffs = coeffs.reshape(num_samples, self.lattice.n)
            self.acceptance_rate = float(
                jnp.sum(states.accepted) /
                jnp.maximum(jnp.sum(states.steps), 1))
        else:
            k0, k1 = jax.random.split(jax.random.fold_in(key, 0x5111c))
            coeffs, _ = klein_sample_batch_pallas(k0, self._target_pre,
                                                  num_samples, tile=tile)
            coeffs, acc = smk_steps_batch_pallas(
                k1, self._target_pre, coeffs, n_steps,
                sigma_prop=self.proposal_sigma, tile=tile)
            self.acceptance_rate = float(jnp.mean(acc)) / n_steps
        if return_coeffs:
            return coeffs
        return klein_points(self.pre.basis, coeffs)


# BASELINE config 4 names the chain "symmetric Metropolis-Klein" (SMK);
# export the sampler under that name too.
SMKSampler = MetropolisKleinSampler
