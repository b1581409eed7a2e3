"""Fused Pallas kernel for symmetric Metropolis-Klein (SMK) — the
random-walk Metropolis chain with a Klein proposal centered at the CURRENT
lattice point (the Wang-Ling variant the BASELINE north star names;
reference semantics: samplers/imhk.py `smk_step`, which this kernel matches
at fused-kernel speed instead of the vmapped lax.scan).

Why this costs only ~1.5 IMHK sweeps per step — three identities in the
recentered coordinates y~ = x - round(cs) (U unit-diagonal upper
triangular):

1. The k-recentering CANCELS from the proposal centers: the scaled center
   of a Klein proposal at the current point is (U y~cur)_i, and the
   conditional center of row i during the draw is
   c_i = (U y~cur)_i - sum_{j>i} U_ij y~new_j — the same coupling
   machinery as the IMHK kernel with the static center replaced by a
   per-chain vector.
2. (U y~new)_i = y~new_i + coupling_i is a FREE byproduct of the sweep:
   the next step's proposal centers (and both cross-densities) come from
   values the sweep already computed — no extra matmul, ever.
3. The MH ratio needs log q(x|y) - log q(y|x); the quadratic parts cancel
   EXACTLY ((y~cur - c')_i = -(y~new - m~)_i), and the forward conditional
   centers m~_i equal the centers c_i used during the draw — so
   log q(x|y) - log q(y|x) = sum_i logZ(c_i) - sum_i logZ(c'_i), with the
   first sum the sweep's existing log-normalizer byproduct and the second
   a single extra window pass per row with NO PRNG, NO CDF matmul, NO
   comparison (exp + sublane sum only).
   The reverse centers are c'_i = (U y~new)_i - (U y~cur)_i + y~cur_i.

The target's log pi(z) = -||Bz - c||^2 / (2 sigma^2) is evaluated from the
same byproducts: ||Bz - c||^2 = sum_i (r_i ((U z~)_i - cse_i))^2 with cse
the kernel-operand effective center, accumulated with per-group Kahan
compensation alongside the reverse sweep.

Precision discipline identical to the IMHK kernel (klein_pallas.py): every
coupling dot is an exact bf16-split pair, the CDF cumsum is the single
concatenated split matmul, log-normalizers pay one log per 8-row group,
and the MH log-ratio terms are Kahan-compensated.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.samplers.klein import KleinPrecomp
from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
    BLOCK,
    GROUP,
    _bf16_split_bits,
    _kernel_operands,
    pallas_supported,  # noqa: F401  (re-exported convenience)
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _smk_kernel(seed_ref, u_ref, ul_ref, uw_ref, ud_ref, cse_ref, isgp_ref,
                wqt_ref, unif_ref, xold_ref, accold_ref,
                x_ref, acc_ref, *rest,
                n, window, tile, n_steps, host_rng=False, debug=False,
                ablate=frozenset()):
    """n_steps fused SMK steps; chain state x resident in VMEM, the current
    centers ct = U @ x~ recomputed ONCE at kernel start into scratch (U is
    unit upper triangular, so one full-row block dot gives (U x~)_i
    exactly) and thereafter maintained incrementally from the sweep's
    byproducts. ct deliberately does NOT round-trip through an aliased
    input/output pair: a second blocked (n, tile) aliased in/out read
    before write corrupted the revolving pipeline windows on multi-program
    grids (observed program-parity-dependent garbage).

    SMEM operands (1, n): cse (effective target center), isgp (inverse
    PROPOSAL conditional sigmas r_i/sigma_p), wqt (r_i / (sqrt(2) sigma_t),
    so the target quadratic is sum (wqt (ct - cse))^2).
    """
    if debug:
        # debug outputs (n_steps == 1): the raw proposal, its centers, and
        # the MH components [lwf, lwr, qn, qc, log_alpha] as (8, tile)
        (pdbg_ref, ctndbg_ref, comp_ref,
         t_ref, z_ref, cn8_ref, xx_ref, p_ref, ctn_ref, ct_ref,
         xs_ref) = rest
    else:
        (t_ref, z_ref, cn8_ref, xx_ref, p_ref, ctn_ref, ct_ref,
         xs_ref) = rest
    prog = pl.program_id(0)
    if not host_rng:
        pltpu.prng_seed(seed_ref[0, 0] + prog * 6271)

    row_w = jax.lax.broadcasted_iota(jnp.int32, (window, 2 * window), 0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (window, 2 * window), 1)
    col_mod = jnp.where(col_w < window, col_w, col_w - window)
    tril2 = (col_mod <= row_w).astype(jnp.float32)
    offs = (jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
            .astype(jnp.float32) - window // 2)
    offs_half = 0.5 * offs * offs
    nb = n // BLOCK

    def uniform_block(shape):
        if "no_prng" in ablate:
            return jnp.full(shape, 0.5, jnp.float32)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        mant = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
        fbits = jnp.bitwise_or(mant, jnp.int32(0x3F800000))
        return pltpu.bitcast(fbits, jnp.float32) - 1.0

    def sample_row(c, isg_row, u01):
        """Inverse-CDF draw (see klein_pallas.sample_row): returns
        (z, m, total) with logZ = m + log(total)."""
        base = jnp.round(c)
        if "no_sample" in ablate:
            one = base * 0.0 + 1.0
            return base, base * 1e-8, one
        delta = base - c
        a = isg_row * isg_row
        lm = -a * (offs_half + delta * offs)
        m = (-0.5) * a * (delta * delta)
        if "no_exp" in ablate:
            w = 1.0 + lm
        else:
            w = jnp.exp(lm)
        if "no_cdf_matmul" in ablate:
            total = jnp.sum(w, axis=0, keepdims=True)
            idx = jnp.round(u01 * float(window - 1))
        else:
            w_hi, w_lo = _bf16_split_bits(w)
            wcat = jnp.concatenate([w_hi, w_lo], axis=0)
            cdf = jnp.dot(tril2, wcat, preferred_element_type=jnp.float32)
            total = cdf[window - 1:window, :]
            target = u01 * total
            idx = jnp.sum((cdf < target).astype(jnp.float32), axis=0,
                          keepdims=True)
        idx = jnp.clip(idx, 0.0, float(window - 1))
        return base + idx - window // 2, m, total

    def logz_row(c, isg_row):
        """Log-normalizer only: no PRNG, no CDF matmul, no compare."""
        base = jnp.round(c)
        delta = base - c
        a = isg_row * isg_row
        lm = -a * (offs_half + delta * offs)
        m = (-0.5) * a * (delta * delta)
        if "no_exp" in ablate:
            total = jnp.sum(1.0 + lm, axis=0, keepdims=True)
        else:
            total = jnp.sum(jnp.exp(lm), axis=0, keepdims=True)
        return m, total

    def propose_smk(ubase):
        """Backward sweep: draws into p_ref, U@y~new into ctn_ref; returns
        the summed forward log-normalizer (1, tile). `ubase` is the row
        offset into the host-uniform buffer for this step (host_rng only;
        layout: n group-draw rows then GROUP accept rows per step)."""
        p_ref[:] = jnp.zeros((n, tile), jnp.float32)
        lw = jnp.zeros((1, tile), jnp.float32)
        comp = jnp.zeros((1, tile), jnp.float32)
        for bi in range(nb - 1, -1, -1):
            lo, hi = bi * BLOCK, (bi + 1) * BLOCK
            if hi < n:
                xt = p_ref[hi:, :]
                t_ref[:] = (jnp.dot(u_ref[lo:hi, hi:], xt,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(ul_ref[lo:hi, hi:], xt,
                                      preferred_element_type=jnp.float32))
            else:
                t_ref[:] = jnp.zeros((BLOCK, tile), jnp.float32)
            xx_ref[:] = jnp.zeros((2 * BLOCK, tile), jnp.float32)

            def group_body(g, carry, *, lo=lo, hi=hi):
                lw, comp = carry
                r8 = pl.multiple_of(BLOCK - GROUP - g * GROUP, GROUP)
                i8 = pl.multiple_of(lo + r8, GROUP)
                u8w = uw_ref[pl.ds(i8, GROUP), :]
                ud8 = ud_ref[pl.ds(i8, GROUP), :]
                t8 = t_ref[pl.ds(r8, GROUP), :]
                ctc8 = ct_ref[pl.ds(i8, GROUP), :]   # per-chain centers
                if host_rng:
                    un8 = unif_ref[pl.ds(pl.multiple_of(ubase + i8, GROUP),
                                         GROUP), :]
                else:
                    un8 = uniform_block((GROUP, tile))
                s8 = jnp.dot(u8w, xx_ref[:],
                             preferred_element_type=jnp.float32)
                msum = None
                tprod = None
                for d in range(GROUP - 1, -1, -1):
                    isgp_d = isgp_ref[0, i8 + d]
                    coup = t8[d:d + 1, :] + s8[d:d + 1, :]
                    for dp in range(d + 1, GROUP):
                        coup = coup + (ud8[d:d + 1, dp:dp + 1]
                                       * z_ref[dp:dp + 1, :])
                    c = ctc8[d:d + 1, :] - coup
                    z, m, total = sample_row(c, isgp_d, un8[d:d + 1, :])
                    z_ref[d:d + 1, :] = z
                    # free byproduct: (U y~new)_i = y~new_i + coupling_i
                    if "no_ctn" in ablate:
                        cn8_ref[d:d + 1, :] = z
                    else:
                        cn8_ref[d:d + 1, :] = z + coup
                    msum = m if msum is None else msum + m
                    tprod = total if tprod is None else tprod * total
                logZ8 = msum + jnp.log(tprod)
                y = logZ8 - comp
                t = lw + y
                comp = (t - lw) - y
                lw = t
                p_ref[pl.ds(i8, GROUP), :] = z_ref[:]
                ctn_ref[pl.ds(i8, GROUP), :] = cn8_ref[:]
                xx_ref[pl.ds(r8, GROUP), :] = z_ref[:]
                xx_ref[pl.ds(pl.multiple_of(BLOCK + r8, GROUP), GROUP),
                       :] = z_ref[:]
                return lw, comp

            lw, comp = jax.lax.fori_loop(0, BLOCK // GROUP,
                                         lambda g, a: group_body(g, a),
                                         (lw, comp))
        return lw - comp

    def reverse_and_quad():
        """Row-independent pass: summed reverse log-normalizer at
        c'_i = ctn_i - ctc_i + x_i, plus the target quadratics for the new
        (qn) and current (qc) states — all Kahan-compensated per group."""
        zero = jnp.zeros((1, tile), jnp.float32)
        lwr, lwr_c = zero, zero
        qn, qn_c = zero, zero
        qc, qc_c = zero, zero

        def group_body(gidx, carry):
            lwr, lwr_c, qn, qn_c, qc, qc_c = carry
            i8 = pl.multiple_of(gidx * GROUP, GROUP)
            ctc8 = ct_ref[pl.ds(i8, GROUP), :]
            ctn8 = ctn_ref[pl.ds(i8, GROUP), :]
            x8 = xs_ref[pl.ds(i8, GROUP), :]
            msum = None
            tprod = None
            qn8 = None
            qc8 = None
            for d in range(GROUP):
                isgp_d = isgp_ref[0, i8 + d]
                cse_d = cse_ref[0, i8 + d]
                wq_d = wqt_ref[0, i8 + d]
                cp = ctn8[d:d + 1, :] - ctc8[d:d + 1, :] + x8[d:d + 1, :]
                m, total = logz_row(cp, isgp_d)
                msum = m if msum is None else msum + m
                tprod = total if tprod is None else tprod * total
                if "no_quad" in ablate:
                    tn = m  # keep shapes; timing-only ablation
                    tc = m
                else:
                    tn = wq_d * (ctn8[d:d + 1, :] - cse_d)
                    tc = wq_d * (ctc8[d:d + 1, :] - cse_d)
                qn8 = tn * tn if qn8 is None else qn8 + tn * tn
                qc8 = tc * tc if qc8 is None else qc8 + tc * tc

            def kadd(acc, comp, val):
                y = val - comp
                t = acc + y
                return t, (t - acc) - y

            lwr, lwr_c = kadd(lwr, lwr_c, msum + jnp.log(tprod))
            qn, qn_c = kadd(qn, qn_c, qn8)
            qc, qc_c = kadd(qc, qc_c, qc8)
            return lwr, lwr_c, qn, qn_c, qc, qc_c

        lwr, lwr_c, qn, qn_c, qc, qc_c = jax.lax.fori_loop(
            0, n // GROUP, group_body,
            (lwr, lwr_c, qn, qn_c, qc, qc_c))
        return lwr - lwr_c, qn - qn_c, qc - qc_c

    # The chain state lives in the xs_ref SCRATCH for the whole kernel,
    # loaded from a REGULAR (non-aliased) input window and stored to the
    # pure output window once at the very end. The original design aliased
    # the state in/out (like the IMHK kernel) and read the aliased window
    # as the kernel's FIRST operation; on multi-program grids the read
    # raced the window's input DMA and saw partial/stale data (hardware
    # only — interpret mode and single-program grids were correct; the
    # IMHK kernel survives because its first read of the aliased window
    # happens a full proposal sweep later). Regular input windows carry
    # their own arrival dependency, which is the semantics we need here.
    xs_ref[:] = xold_ref[:]
    # initial centers: ct = U @ x~ per block — the full-row dot includes
    # j < i columns, which are zero in the upper-triangular U, so this is
    # exactly x~_i + sum_{j>i} U_ij x~_j
    for bi in range(nb):
        lo, hi = bi * BLOCK, (bi + 1) * BLOCK
        xt = xs_ref[lo:, :]
        ct_ref[lo:hi, :] = (
            jnp.dot(u_ref[lo:hi, lo:], xt,
                    preferred_element_type=jnp.float32)
            + jnp.dot(ul_ref[lo:hi, lo:], xt,
                      preferred_element_type=jnp.float32))

    def step_body(s, acc_st):
        ubase = pl.multiple_of(s * (n + GROUP), GROUP)
        lw_fwd = propose_smk(ubase)
        if "no_reverse" in ablate:
            zero = jnp.zeros((1, tile), jnp.float32)
            lw_rev, qn, qc = zero, zero, zero
        else:
            lw_rev, qn, qc = reverse_and_quad()
        # log alpha = [log pi(y) - log pi(x)] + [log q(x|y) - log q(y|x)]
        #           = (qc - qn) + (lw_fwd - lw_rev)
        log_alpha = (qc - qn) + (lw_fwd - lw_rev)
        if debug:
            pdbg_ref[:] = p_ref[:]
            ctndbg_ref[:] = ctn_ref[:]
            comp_ref[0:1, :] = lw_fwd
            comp_ref[1:2, :] = lw_rev
            comp_ref[2:3, :] = qn
            comp_ref[3:4, :] = qc
            comp_ref[4:5, :] = log_alpha
        if host_rng:
            u8 = unif_ref[pl.ds(pl.multiple_of(ubase + n, GROUP), GROUP), :]
            u01 = u8[0:1, :]
        else:
            u01 = uniform_block((1, tile))
        u01 = jnp.maximum(u01, 1e-30)
        accept = jnp.log(u01) < log_alpha
        xs_ref[:] = jnp.where(accept, p_ref[:], xs_ref[:])
        ct_ref[:] = jnp.where(accept, ctn_ref[:], ct_ref[:])
        return acc_st + accept.astype(jnp.float32)

    acc_ref[:] = jax.lax.fori_loop(0, n_steps, step_body, accold_ref[:])
    x_ref[:] = xs_ref[:]


@functools.partial(jax.jit, static_argnames=("tile", "n_steps", "window",
                                             "interpret", "debug",
                                             "host_rng", "ablate"))
def _smk_steps_jit(key, pre: KleinPrecomp, coeffs, acc, sigmas_prop,
                   n_steps: int, tile: int, window: int,
                   interpret: bool = False, debug: bool = False,
                   host_rng: bool = False, ablate: frozenset = frozenset()):
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import _pad_precomp
    B = coeffs.shape[0]
    assert B % tile == 0, f"batch must be a multiple of {tile}"
    ppre, n_real = _pad_precomp(pre, BLOCK)
    n = ppre.U.shape[0]

    k_seed, k_unif = jax.random.split(key)
    seed = jax.random.randint(k_seed, (1, 1), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    if host_rng:
        unif = jax.random.uniform(k_unif, (n_steps * (n + GROUP), B),
                                  dtype=jnp.float32)
    else:  # tiny placeholder (never read)
        unif = jnp.zeros((8, B), dtype=jnp.float32)
    Uh, Ulo, uw, ud, cse, isg_t, kshift = _kernel_operands(ppre)
    # pad the proposal widths like _pad_precomp pads the target's
    sp = jnp.concatenate([
        sigmas_prop.astype(jnp.float32),
        jnp.full((n - n_real,), 1e-6, jnp.float32)])
    isgp = (1.0 / sp)[None, :]
    # r_i / (sqrt(2) sigma_target); keep f32 under jax_enable_x64
    wqt = (isg_t / np.sqrt(2.0)).astype(jnp.float32)

    y0 = jnp.zeros((n, B), jnp.float32).at[:n_real, :].set(
        coeffs.T.astype(jnp.float32) - kshift[:n_real, None])
    acc0 = acc.astype(jnp.float32)[None, :]

    kernel = functools.partial(_smk_kernel, n=n, window=window, tile=tile,
                               n_steps=n_steps, host_rng=host_rng,
                               debug=debug, ablate=ablate)
    out_specs = [
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, B), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.float32),
    ]
    if debug:
        out_specs += [
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n, B), jnp.float32),
            jax.ShapeDtypeStruct((n, B), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2 * BLOCK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, GROUP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((unif.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, tile), jnp.float32),      # t
            pltpu.VMEM((GROUP, tile), jnp.float32),      # z
            pltpu.VMEM((GROUP, tile), jnp.float32),      # cn8
            pltpu.VMEM((2 * BLOCK, tile), jnp.float32),  # xx mirror
            pltpu.VMEM((n, tile), jnp.float32),          # proposal p
            pltpu.VMEM((n, tile), jnp.float32),          # ct_new
            pltpu.VMEM((n, tile), jnp.float32),          # ct current
            pltpu.VMEM((n, tile), jnp.float32),          # xs chain state
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, Uh, Ulo, uw, ud, cse, isgp, wqt, unif, y0, acc0)
    if debug:
        x, acc_out, pdbg, ctndbg, comp = outs
        return (x[:n_real, :].T + kshift[None, :n_real], acc_out[0],
                {"p": pdbg[:n_real].T, "ctn": ctndbg[:n_real].T,
                 "lwf": comp[0], "lwr": comp[1], "qn": comp[2],
                 "qc": comp[3], "log_alpha": comp[4],
                 "kshift": kshift[:n_real]})
    x, acc_out = outs
    return x[:n_real, :].T + kshift[None, :n_real], acc_out[0]


def smk_steps_batch_pallas(key, pre: KleinPrecomp, coeffs, n_steps: int,
                           sigma_prop=None, tile: int = 0,
                           interpret: bool = False, host_rng: bool = False,
                           debug: bool = False,
                           ablate: frozenset = frozenset(),
                           window_budget: float = 0.01):
    """Run n_steps fused SMK steps on (B, n) integer coefficient state.

    `pre` is the TARGET precomputation (sigma = target width, cs = target
    center); the Klein proposal is centered at the current point with width
    `sigma_prop`. Returns (coeffs, acc f32).

    sigma_prop defaults to the RWM-optimal scaling 2.38 sigma / sqrt(n).
    Dimension story (inherent to symmetric Metropolis, not this kernel):
    a proposal as wide as the target pays a quadratic penalty ~n/2 nats
    per step (measured acceptance e^{-n/2} at dim 1024), while the
    optimally-scaled proposal keeps O(1) acceptance but moves each
    coordinate by O(1/sqrt(n)) — on a DISCRETE lattice that means most
    per-coordinate moves are zero at large n. SMK is therefore the
    low-to-moderate-dimension local-move chain; IMHK (independent
    proposal, O(1) acceptance at any dimension when sigma is above
    smoothing) is the crypto-dimension workhorse. This mirrors the
    classical random-walk-vs-independence-sampler tradeoff and is why the
    reference centers on IMHK (reference smk semantics:
    samplers/imhk.py:117-162 here; Wang-Ling's independent MHK).

    tile=0 picks the widest tile fitting VMEM: SMK keeps TWO extra
    (n, tile) buffers resident vs IMHK (ct and ct_new), so the default
    drops earlier with dimension.
    """
    from lattice_gaussian_mcmc_tpu.samplers.klein import (
        suggest_window,
        suggest_window_budget,
    )
    n = pre.n
    if tile == 0:
        tile = 4096 if n <= 512 else (2048 if n <= 1024 else 512)
    if sigma_prop is None:
        sigma_prop = 2.38 * float(pre.sigma) / float(np.sqrt(n))
    sigma_prop = float(sigma_prop)
    scale = sigma_prop / float(pre.sigma)
    sigmas_prop = pre.sigmas * scale
    # window policy: total-tail-budget over the PROPOSAL conditional-sigma
    # profile (same discrete-aware policy as the IMHK bench; r5 SMK
    # profile showed the window-proportional phases — CDF matmul, 1D
    # draws, reverse-pass exps — dominate, and the old worst-row tau rule
    # paid window 16 where the budget admits 8 on the bench config).
    # window_budget=0 falls back to the tau rule.
    if window_budget > 0:
        window = suggest_window_budget(
            np.abs(np.asarray(sigmas_prop, dtype=np.float64)),
            window_budget)
    else:
        window = suggest_window(float(jnp.max(sigmas_prop)))
    window = min(window, 1024)
    acc = jnp.zeros((coeffs.shape[0],), jnp.float32)
    return _smk_steps_jit(key, pre, coeffs, acc, sigmas_prop, n_steps,
                          tile, window, interpret, debug, host_rng, ablate)
