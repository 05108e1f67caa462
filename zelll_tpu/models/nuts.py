"""Samplers for the surface-sampling workload.

The reference drives `nuts-rs` (a Rust NUTS implementation) with a
CpuLogpFunc wrapping the SDF gradient (surface-sampling/src/surface.rs,
examples/cli.rs:87-122), one chain on one core. Two TPU-native samplers:

* `hmc_sample_batched` — the production path: thousands of independent
  chains advance in lockstep under one jit (each chain samples one surface
  point), with jittered trajectory lengths and dual-averaging step-size
  adaptation during burn-in. This is how a batched accelerator actually
  wants to sample; the reference generates draws serially.

* `nuts_sample_batched` — the No-U-Turn sampler itself, on device: C
  chains advance in lockstep under one jit, each draw doubling its
  trajectory iteratively (no recursion — a `lax.while_loop` over tree
  depths with a fori_loop of 2^d leapfrog steps per doubling, the
  checkpoint bit-trick for the within-subtree U-turn checks, and
  multinomial proposal sampling). Per-chain trajectory lengths are
  data-dependent exactly as in nuts-rs; lockstep cost per draw is the
  deepest chain's tree. Same warmup as the HMC path (dual-averaging
  step size + diagonal mass from Welford variance).

* `nuts_sample` — classic No-U-Turn sampler (Hoffman & Gelman alg. 3 with
  slice sampling) with host-side tree recursion calling the jitted
  (value, grad) function: single-chain parity with the reference CLI
  semantics (burn-in + draws, recoverable out-of-range rejection —
  surface.rs:10-14 maps to logp = -inf outside the grid).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hmc_sample_batched", "nuts_sample", "nuts_sample_batched"]


# -- batched HMC --------------------------------------------------------------


def hmc_sample_batched(
    logdensity_fn: Callable,
    initial_positions,  # (C, D)
    key,
    *,
    num_warmup: int = 300,
    num_samples: int = 500,
    num_leapfrog: int = 16,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    value_and_grad_fn: Callable | None = None,
):
    """Run C independent HMC chains in lockstep; returns (samples, accept).

    samples: (num_samples, C, D). Warmup adapts, per chain, (a) the step
    size by dual averaging and (b) a diagonal mass matrix from the Welford
    variance of the draws over the middle warmup window (frozen at 3/4 of
    warmup with Stan-style shrinkage toward unit mass) — the analogue of
    nuts-rs's step-size + diagonal mass adaptation driven by the reference
    CLI (surface-sampling/examples/cli.rs:87-111). Trajectory lengths are
    jittered independently per chain (each chain stops its leapfrog at its
    own length; lockstep cost is the max). Chains whose proposal lands at
    logp = -inf (outside the grid) reject — the analogue of the reference's
    recoverable SurfaceSdfError (surface.rs:10-14).

    ``value_and_grad_fn``, when given, is a BATCHED ``(C, D) ->
    ((C,), (C, D))`` (logp, grad) function used instead of
    ``vmap(value_and_grad(logdensity_fn))`` — e.g. the analytic join-kernel
    gradient from `SmoothDistanceField.hmc_vgrad_fn` (one fused kernel
    dispatch per leapfrog step instead of autodiff through the gather
    path). ``logdensity_fn`` may then be None.
    """
    initial_positions = jnp.asarray(initial_positions)
    C, D = initial_positions.shape
    vgrad = (
        value_and_grad_fn
        if value_and_grad_fn is not None
        else jax.vmap(jax.value_and_grad(logdensity_fn))
    )

    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def kinetic(p, minv):
        return 0.5 * jnp.sum(p * p * minv, axis=-1)

    def leapfrog(q, p, g, lp, eps, minv, n_steps):
        """Per-chain trajectory lengths: every chain runs in lockstep for
        num_leapfrog iterations but chain c's state freezes after its own
        n_steps[c] — per-chain jitter at lockstep cost. The gradient (and
        logp) are carried through the loop: the gradient at the step's
        start equals the one computed at the previous step's end, so each
        iteration costs ONE vgrad dispatch, not two."""

        def body(i, qpgl):
            q, p, g, lp = qpgl
            active = (i < n_steps)[:, None]
            p1 = p + 0.5 * eps[:, None] * g
            q1 = q + eps[:, None] * (minv * p1)
            lp1, g1 = vgrad(q1)
            p1 = p1 + 0.5 * eps[:, None] * g1
            return (
                jnp.where(active, q1, q),
                jnp.where(active, p1, p),
                jnp.where(active, g1, g),
                jnp.where(active[:, 0], lp1, lp),
            )

        return jax.lax.fori_loop(0, num_leapfrog, body, (q, p, g, lp))

    def step(state, key, adapt: bool, t):
        q, log_eps, h_bar, log_eps_bar, minv = state
        k1, k2, k3 = jax.random.split(key, 3)
        # momentum ~ N(0, M) with M = 1/minv (diagonal)
        p = jax.random.normal(k1, q.shape, q.dtype) / jnp.sqrt(minv)
        lp0, g0 = vgrad(q)
        h0 = lp0 - kinetic(p, minv)

        eps = jnp.exp(log_eps)
        # per-chain jittered trajectory length: 1..num_leapfrog steps
        n_steps = jax.random.randint(k3, (C,), 1, num_leapfrog + 1)
        q_new, p_new, _, lp1 = leapfrog(q, p, g0, lp0, eps, minv, n_steps)
        h1 = lp1 - kinetic(p_new, minv)

        log_ratio = h1 - h0
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
        u = jax.random.uniform(k2, (C,))
        accepted = u < accept_prob
        q = jnp.where(accepted[:, None], q_new, q)

        if adapt:
            tt = t + 1.0
            h_bar = (1 - 1 / (tt + t0)) * h_bar + (
                target_accept - accept_prob
            ) / (tt + t0)
            log_eps = mu - jnp.sqrt(tt) / gamma * h_bar
            w = tt ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (q, log_eps, h_bar, log_eps_bar, minv), (q, accept_prob)

    return _adaptive_run(
        step, initial_positions, key, num_warmup, num_samples,
        init_step_size,
    )


def _adaptive_run(step, q0, key, num_warmup, num_samples, init_step_size):
    """Warmup + sampling scan shared by the batched samplers.

    ``step(state, key, adapt, t) -> (state, (q, accept_prob))`` with
    state = (q (C,D), log_eps (C,), h_bar (C,), log_eps_bar (C,),
    minv (C,D)). Warmup adapts the step size every draw (the step's own
    dual averaging) and a diagonal mass matrix from the Welford variance
    of the draws over [warmup/4, 3*warmup/4), frozen at 3/4 of warmup
    with Stan-style shrinkage toward unit mass."""
    C, D = q0.shape
    t_collect = num_warmup // 4  # Welford window start
    t_freeze = max(num_warmup * 3 // 4, t_collect + 1)  # mass freeze

    @jax.jit
    def run(q0, key):
        keys = jax.random.split(key, num_warmup + num_samples)
        minv0 = jnp.ones((C, D), q0.dtype)
        state0 = (
            q0,
            jnp.full((C,), jnp.log(init_step_size)),
            jnp.zeros((C,)),
            jnp.full((C,), jnp.log(init_step_size)),
            minv0,
        )
        welford0 = (
            jnp.zeros((C, D), q0.dtype),  # mean
            jnp.zeros((C, D), q0.dtype),  # m2
            jnp.zeros((), q0.dtype),  # count
        )

        def warm_body(carry, kt):
            state, (mean, m2, cnt) = carry
            k, t = kt
            state, _ = step(state, k, adapt=True, t=t)
            q = state[0]

            # Welford variance of warmup draws in [t_collect, t_freeze)
            collect = (t >= t_collect) & (t < t_freeze)
            cnt1 = cnt + 1.0
            delta = q - mean
            mean1 = mean + delta / cnt1
            m2_1 = m2 + delta * (q - mean1)
            mean, m2, cnt = (
                jnp.where(collect, mean1, mean),
                jnp.where(collect, m2_1, m2),
                jnp.where(collect, cnt1, cnt),
            )

            # freeze the diagonal mass at 3/4 warmup: Stan-style shrinkage
            # var * n/(n+5) + 1e-3 * 5/(n+5), unit mass if nothing collected
            var = m2 / jnp.maximum(cnt - 1.0, 1.0)
            reg = var * (cnt / (cnt + 5.0)) + 1e-3 * (5.0 / (cnt + 5.0))
            minv_new = jnp.where(cnt > 1.0, reg, jnp.ones_like(reg))
            state = (*state[:4], jnp.where(t == t_freeze, minv_new, state[4]))
            return (state, (mean, m2, cnt)), None

        (state, _), _ = jax.lax.scan(
            warm_body,
            (state0, welford0),
            (keys[:num_warmup], jnp.arange(num_warmup, dtype=jnp.float32)),
        )
        # freeze at averaged step size
        q, _, h_bar, log_eps_bar, minv = state
        state = (q, log_eps_bar, h_bar, log_eps_bar, minv)

        def samp_body(carry, k):
            new_state, (qs, ap) = step(carry, k, adapt=False, t=0.0)
            return new_state, (qs, ap)

        state, (samples, accept) = jax.lax.scan(
            samp_body, state, keys[num_warmup:]
        )
        return samples, accept

    return run(q0, key)


# -- batched device-side NUTS --------------------------------------------------


def nuts_sample_batched(
    logdensity_fn: Callable | None,
    initial_positions,  # (C, D)
    key,
    *,
    num_warmup: int = 300,
    num_samples: int = 500,
    max_treedepth: int = 8,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    value_and_grad_fn: Callable | None = None,
):
    """C No-U-Turn chains in lockstep, entirely on device; one jit.

    The TPU-native form of the reference's nuts-rs sampler
    (surface-sampling/examples/cli.rs:87-122): multinomial NUTS
    (Betancourt 2017) with iterative tree doubling — recursion is
    replaced by a `lax.while_loop` over tree depths whose d-th iteration
    runs 2^d leapfrog steps, using the checkpoint bit-trick (popcount /
    trailing-ones over the leaf index) for the within-subtree
    generalized-U-turn checks, so the whole draw is compiler-friendly
    control flow. Each chain stops doubling at its own U-turn/divergence;
    finished chains are masked while the rest continue (lockstep cost =
    the deepest chain). Divergences (energy error > 1000) and logp = -inf
    proposals (outside the grid — the reference's recoverable
    SurfaceSdfError, surface.rs:10-14) terminate the doubling without
    contributing.

    Warmup matches `hmc_sample_batched`: per-chain dual-averaging step
    size toward ``target_accept`` and a diagonal mass matrix from the
    Welford variance of mid-warmup draws. ``value_and_grad_fn`` is the
    same batched override (e.g. `SmoothDistanceField.hmc_vgrad_fn` — one
    fused join-kernel dispatch per leapfrog step for all chains).

    Returns (samples (num_samples, C, D), accept_stat (num_samples, C)).
    """
    initial_positions = jnp.asarray(initial_positions)
    C, D = initial_positions.shape
    vgrad = (
        value_and_grad_fn
        if value_and_grad_fn is not None
        else jax.vmap(jax.value_and_grad(logdensity_fn))
    )

    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    max_delta_energy = 1000.0

    def kinetic(p, minv):
        return 0.5 * jnp.sum(p * p * minv, axis=-1)

    def is_turning(rho, p_l, p_r, minv):
        """Generalized no-U-turn criterion over a trajectory segment:
        rho = sum of momenta over the segment, p_l/p_r its endpoint
        momenta; turning when the segment's net displacement direction
        (M^-1 rho) opposes either endpoint velocity."""
        v_l = jnp.sum(rho * (minv * p_l), axis=-1)
        v_r = jnp.sum(rho * (minv * p_r), axis=-1)
        return (v_l < 0) | (v_r < 0)

    def leapfrog(q, p, g, eps_signed, minv):
        """One step with the start-point gradient carried in (it equals
        the gradient computed at the previous step's end): ONE vgrad
        dispatch per leapfrog."""
        p1 = p + 0.5 * eps_signed[:, None] * g
        q1 = q + eps_signed[:, None] * (minv * p1)
        lp, g1 = vgrad(q1)
        p1 = p1 + 0.5 * eps_signed[:, None] * g1
        return q1, p1, lp, g1

    def build_subtree(depth, q0, p0, g0, eps_signed, h0, minv, key,
                      active):
        """2^depth leapfrog steps from (q0, p0) with gradient g0; returns
        the subtree's endpoint (+ its gradient), momentum sum,
        multinomial proposal, log sum weight, invalid flag (internal
        U-turn or divergence), and the acceptance-statistic sums. All
        (C, ...) with `active` masking."""
        n_leaf = jnp.int32(1) << depth
        neg_inf = jnp.full((C,), -jnp.inf, q0.dtype)

        # checkpoints of (momentum, running momentum-sum) at subtree roots
        ckpt_p0 = jnp.zeros((max_treedepth, C, D), q0.dtype)
        ckpt_rho0 = jnp.zeros((max_treedepth, C, D), q0.dtype)

        def cond(c):
            i = c[0]
            alive = c[10]
            return (i < n_leaf) & jnp.any(alive)

        def body(c):
            (i, qc, pc, gc, rho, prop, lw, alpha, n_alpha, invalid, alive,
             ckpt_p, ckpt_rho) = c
            q1, p1, lp, g1 = leapfrog(qc, pc, gc, eps_signed, minv)
            h = lp - kinetic(p1, minv)
            lw_leaf = h - h0
            div = ~jnp.isfinite(h) | (h0 - h > max_delta_energy)
            lw_leaf = jnp.where(div, neg_inf, lw_leaf)

            # progressive multinomial proposal within the subtree
            lw_new = jnp.logaddexp(lw, lw_leaf)
            u = jax.random.uniform(jax.random.fold_in(key, i), (C,))
            take = alive & (
                jnp.log(u) < lw_leaf - jnp.where(lw_new == -jnp.inf, 0.0,
                                                 lw_new)
            ) & ~div
            rho1 = rho + p1

            # within-subtree generalized U-turn via checkpoints: leaf
            # index bit pattern picks which balanced subtrees end here
            idx_max = jax.lax.population_count(i >> 1)
            trailing_ones = jax.lax.population_count(i ^ (i + 1)) - 1
            idx_min = idx_max - trailing_ones + 1
            even = (i & 1) == 0

            # even leaves open a balanced subtree: store (p, rho-before)
            ckpt_p = jnp.where(even, ckpt_p.at[idx_max].set(p1), ckpt_p)
            ckpt_rho = jnp.where(
                even, ckpt_rho.at[idx_max].set(rho1), ckpt_rho
            )

            # odd leaves close subtrees [idx_min..idx_max]: check each
            def turn_scan(k, turning):
                seg_rho = rho1 - ckpt_rho[k] + ckpt_p[k]
                return turning | is_turning(seg_rho, ckpt_p[k], p1, minv)

            turning = jax.lax.cond(
                even,
                lambda: jnp.zeros((C,), bool),
                lambda: jax.lax.fori_loop(
                    idx_min, idx_max + 1, turn_scan, jnp.zeros((C,), bool)
                ),
            )

            alpha_leaf = jnp.where(
                jnp.isfinite(h), jnp.exp(jnp.minimum(h - h0, 0.0)), 0.0
            )

            upd = alive[:, None]
            qc = jnp.where(upd, q1, qc)
            pc = jnp.where(upd, p1, pc)
            gc = jnp.where(upd, g1, gc)
            rho = jnp.where(upd, rho1, rho)
            prop = jnp.where(take[:, None], q1, prop)
            lw = jnp.where(alive, lw_new, lw)
            alpha = alpha + jnp.where(alive, alpha_leaf, 0.0)
            n_alpha = n_alpha + alive.astype(alpha.dtype)
            invalid = invalid | (alive & (div | turning))
            alive = alive & ~(div | turning)
            return (i + 1, qc, pc, gc, rho, prop, lw, alpha, n_alpha,
                    invalid, alive, ckpt_p, ckpt_rho)

        init = (
            jnp.int32(0), q0, p0, g0, jnp.zeros_like(q0), q0, neg_inf,
            jnp.zeros((C,), q0.dtype), jnp.zeros((C,), q0.dtype),
            jnp.zeros((C,), bool), active, ckpt_p0, ckpt_rho0,
        )
        (_, q_end, p_end, g_end, rho, prop, lw, alpha, n_alpha, invalid,
         _, _, _) = jax.lax.while_loop(cond, body, init)
        return q_end, p_end, g_end, rho, prop, lw, invalid, alpha, n_alpha

    def transition(q, log_eps, minv, key):
        """One NUTS draw for all chains; returns (q', accept_stat)."""
        k_mom, k_dir, k_acc = jax.random.split(key, 3)
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(minv)
        lp0, g0 = vgrad(q)
        g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
        h0 = lp0 - kinetic(p0, minv)
        finite0 = jnp.isfinite(h0)
        h0 = jnp.where(finite0, h0, 0.0)
        eps = jnp.exp(log_eps)

        def cond(c):
            depth, done = c[0], c[1]
            return (depth < max_treedepth) & jnp.any(~done)

        def body(c):
            (depth, done, zl_q, zl_p, zl_g, zr_q, zr_p, zr_g, rho, prop,
             lw, alpha, n_alpha) = c
            kd = jax.random.fold_in(k_dir, depth)
            k_v, k_sub, k_merge = jax.random.split(kd, 3)
            fwd = jax.random.bernoulli(k_v, 0.5, (C,))
            q0 = jnp.where(fwd[:, None], zr_q, zl_q)
            p0c = jnp.where(fwd[:, None], zr_p, zl_p)
            g0c = jnp.where(fwd[:, None], zr_g, zl_g)
            sgn = jnp.where(fwd, 1.0, -1.0).astype(q.dtype)

            (q_end, p_end, g_end, rho_sub, prop_sub, lw_sub, invalid,
             a_sub, na_sub) = build_subtree(
                depth, q0, p0c, g0c, sgn * eps, h0, minv, k_sub, ~done
            )

            # biased progressive sampling between the old tree and the
            # new subtree: accept prob = min(1, exp(lw_sub - lw))
            u = jax.random.uniform(k_merge, (C,))
            take = ~done & ~invalid & (jnp.log(u) < lw_sub - lw)
            prop = jnp.where(take[:, None], prop_sub, prop)
            lw = jnp.where(~done & ~invalid, jnp.logaddexp(lw, lw_sub), lw)

            grow = (~done & ~invalid)[:, None]
            zl_q = jnp.where(grow & ~fwd[:, None], q_end, zl_q)
            zl_p = jnp.where(grow & ~fwd[:, None], p_end, zl_p)
            zl_g = jnp.where(grow & ~fwd[:, None], g_end, zl_g)
            zr_q = jnp.where(grow & fwd[:, None], q_end, zr_q)
            zr_p = jnp.where(grow & fwd[:, None], p_end, zr_p)
            zr_g = jnp.where(grow & fwd[:, None], g_end, zr_g)
            rho_new = rho + rho_sub
            rho = jnp.where(grow, rho_new, rho)
            turning = is_turning(rho, zl_p, zr_p, minv)

            alpha = alpha + a_sub
            n_alpha = n_alpha + na_sub
            done = done | invalid | (~done & turning)
            return (depth + 1, done, zl_q, zl_p, zl_g, zr_q, zr_p, zr_g,
                    rho, prop, lw, alpha, n_alpha)

        init = (
            jnp.int32(0), ~finite0, q, p0, g0, q, p0, g0, p0, q,
            jnp.zeros((C,), q.dtype),
            jnp.zeros((C,), q.dtype), jnp.zeros((C,), q.dtype),
        )
        out = jax.lax.while_loop(cond, body, init)
        prop, alpha, n_alpha = out[9], out[11], out[12]
        q_new = jnp.where(finite0[:, None], prop, q)
        accept_stat = alpha / jnp.maximum(n_alpha, 1.0)
        return q_new, accept_stat

    def step(state, key, adapt: bool, t):
        q, log_eps, h_bar, log_eps_bar, minv = state
        q, accept_prob = transition(q, log_eps, minv, key)
        if adapt:
            tt = t + 1.0
            h_bar = (1 - 1 / (tt + t0)) * h_bar + (
                target_accept - accept_prob
            ) / (tt + t0)
            log_eps = mu - jnp.sqrt(tt) / gamma * h_bar
            w = tt ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (q, log_eps, h_bar, log_eps_bar, minv), (q, accept_prob)

    return _adaptive_run(
        step, initial_positions, key, num_warmup, num_samples,
        init_step_size,
    )


# -- host-recursion NUTS -------------------------------------------------------


def nuts_sample(
    value_and_grad_fn: Callable,
    initial_position: np.ndarray,
    *,
    num_warmup: int = 200,
    num_samples: int = 300,
    max_treedepth: int = 8,
    target_accept: float = 0.8,
    seed: int = 0,
):
    """Single-chain No-U-Turn sampler (Hoffman & Gelman 2014, alg. 3).

    ``value_and_grad_fn(q) -> (logp, grad)`` may be jitted; recursion runs
    on the host like the reference's nuts-rs chain loop (cli.rs:115-122).
    Returns (samples (num_samples, D), acceptance statistics).
    """
    rng = np.random.default_rng(seed)
    q = np.asarray(initial_position, np.float64)
    D = q.shape[0]

    # dual averaging state
    eps = _find_reasonable_epsilon(value_and_grad_fn, q, rng)
    mu = math.log(10 * eps)
    log_eps_bar, h_bar = 0.0, 0.0
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def leapfrog(q, p, g, eps):
        """Start-point gradient g carried in (= previous step's end
        gradient): one value_and_grad call per leapfrog, not two."""
        p = p + 0.5 * eps * np.asarray(g)
        q = q + eps * p
        lp, g1 = value_and_grad_fn(q)
        p = p + 0.5 * eps * np.asarray(g1)
        return q, p, float(lp), g1

    def build_tree(q, p, g, log_u, v, depth, eps, h0):
        if depth == 0:
            q1, p1, lp1, g1 = leapfrog(q, p, g, v * eps)
            joint = lp1 - 0.5 * float(p1 @ p1)
            n1 = int(log_u <= joint)
            s1 = int(log_u < joint + 1000.0) and np.isfinite(joint)
            a1 = min(1.0, math.exp(min(joint - h0, 0.0))) if np.isfinite(joint) else 0.0
            return q1, p1, g1, q1, p1, g1, q1, n1, s1, a1, 1
        qm, pm, gm, qp, pp, gp, q1, n1, s1, a1, na1 = build_tree(
            q, p, g, log_u, v, depth - 1, eps, h0
        )
        if s1:
            if v == -1:
                qm, pm, gm, _, _, _, q2, n2, s2, a2, na2 = build_tree(
                    qm, pm, gm, log_u, v, depth - 1, eps, h0
                )
            else:
                _, _, _, qp, pp, gp, q2, n2, s2, a2, na2 = build_tree(
                    qp, pp, gp, log_u, v, depth - 1, eps, h0
                )
            if n1 + n2 > 0 and rng.random() < n2 / (n1 + n2):
                q1 = q2
            a1, na1 = a1 + a2, na1 + na2
            dq = qp - qm
            s1 = s2 and (dq @ pm >= 0) and (dq @ pp >= 0)
            n1 = n1 + n2
        return qm, pm, gm, qp, pp, gp, q1, n1, s1, a1, na1

    samples = []
    accept_stats = []
    total = num_warmup + num_samples
    for t in range(total):
        p0 = rng.standard_normal(D)
        lp0, g0 = value_and_grad_fn(q)
        h0 = float(lp0) - 0.5 * float(p0 @ p0)
        log_u = h0 + math.log(rng.random() + 1e-300)

        qm, qp, pm, pp = q.copy(), q.copy(), p0.copy(), p0.copy()
        gm, gp = np.asarray(g0), np.asarray(g0)
        n, s, depth = 1, True, 0
        alpha, n_alpha = 0.0, 1
        while s and depth < max_treedepth:
            v = 1 if rng.random() < 0.5 else -1
            if v == -1:
                qm, pm, gm, _, _, _, q1, n1, s1, a, na = build_tree(
                    qm, pm, gm, log_u, v, depth, eps, h0
                )
            else:
                _, _, _, qp, pp, gp, q1, n1, s1, a, na = build_tree(
                    qp, pp, gp, log_u, v, depth, eps, h0
                )
            if s1 and rng.random() < min(1.0, n1 / n):
                q = q1
            n += n1
            dq = qp - qm
            s = s1 and (dq @ pm >= 0) and (dq @ pp >= 0)
            depth += 1
            alpha, n_alpha = alpha + a, n_alpha + na

        # dual averaging
        if t < num_warmup:
            tt = t + 1
            h_bar = (1 - 1 / (tt + t0)) * h_bar + (
                target_accept - alpha / n_alpha
            ) / (tt + t0)
            log_eps = mu - math.sqrt(tt) / gamma * h_bar
            w = tt ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            eps = math.exp(log_eps)
        elif t == num_warmup:
            eps = math.exp(log_eps_bar)
        if t >= num_warmup:
            samples.append(q.copy())
            accept_stats.append(alpha / n_alpha)
    return np.asarray(samples), np.asarray(accept_stats)


def _find_reasonable_epsilon(vg, q, rng):
    eps = 1.0
    p = rng.standard_normal(q.shape[0])
    lp, g = vg(q)
    h0 = float(lp) - 0.5 * float(p @ p)
    q1 = q + eps * (p + 0.5 * eps * np.asarray(g))
    p1 = p + 0.5 * eps * np.asarray(g)
    lp1, g1 = vg(q1)
    p1 = p1 + 0.5 * eps * np.asarray(g1)
    h1 = float(lp1) - 0.5 * float(p1 @ p1)
    if not np.isfinite(h1):
        return 0.1
    a = 1.0 if h1 - h0 > math.log(0.5) else -1.0
    for _ in range(20):
        eps *= 2.0**a
        q1 = q + eps * p
        lp1, _ = vg(q1)
        h1 = float(lp1) - 0.5 * float(p @ p)
        if not np.isfinite(h1) or a * (h1 - h0) <= a * math.log(0.5):
            break
    return max(min(eps, 10.0), 1e-4)
