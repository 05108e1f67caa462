"""Samplers for the surface-sampling workload.

The reference drives `nuts-rs` (a Rust NUTS implementation) with a
CpuLogpFunc wrapping the SDF gradient (surface-sampling/src/surface.rs,
examples/cli.rs:87-122), one chain on one core. Two TPU-native samplers:

* `hmc_sample_batched` — the production path: thousands of independent
  chains advance in lockstep under one jit (each chain samples one surface
  point), with jittered trajectory lengths and dual-averaging step-size
  adaptation during burn-in. This is how a batched accelerator actually
  wants to sample; the reference generates draws serially.

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

__all__ = ["hmc_sample_batched", "nuts_sample"]


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
    t_collect = num_warmup // 4  # Welford window start
    t_freeze = max(num_warmup * 3 // 4, t_collect + 1)  # mass freeze

    def kinetic(p, minv):
        return 0.5 * jnp.sum(p * p * minv, axis=-1)

    def leapfrog(q, p, eps, minv, n_steps):
        """Per-chain trajectory lengths: every chain runs in lockstep for
        num_leapfrog iterations but chain c's state freezes after its own
        n_steps[c] — per-chain jitter at lockstep cost."""

        def body(i, qp):
            q, p = qp
            active = (i < n_steps)[:, None]
            _, g = vgrad(q)
            p1 = p + 0.5 * eps[:, None] * g
            q1 = q + eps[:, None] * (minv * p1)
            _, g = vgrad(q1)
            p1 = p1 + 0.5 * eps[:, None] * g
            return jnp.where(active, q1, q), jnp.where(active, p1, p)

        return jax.lax.fori_loop(0, num_leapfrog, body, (q, p))

    def step(state, key, adapt: bool, t):
        q, log_eps, h_bar, log_eps_bar, minv = state
        k1, k2, k3 = jax.random.split(key, 3)
        # momentum ~ N(0, M) with M = 1/minv (diagonal)
        p = jax.random.normal(k1, q.shape, q.dtype) / jnp.sqrt(minv)
        lp0, _ = vgrad(q)
        h0 = lp0 - kinetic(p, minv)

        eps = jnp.exp(log_eps)
        # per-chain jittered trajectory length: 1..num_leapfrog steps
        n_steps = jax.random.randint(k3, (C,), 1, num_leapfrog + 1)
        q_new, p_new = leapfrog(q, p, eps, minv, n_steps)
        lp1, _ = vgrad(q_new)
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

    @jax.jit
    def run(q0, key):
        keys = jax.random.split(key, num_warmup + num_samples)
        minv0 = jnp.ones((C, D), q0.dtype)
        hmc0 = (
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
            (hmc0, welford0),
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

    return run(initial_positions, key)


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

    def leapfrog(q, p, eps):
        lp, g = value_and_grad_fn(q)
        p = p + 0.5 * eps * np.asarray(g)
        q = q + eps * p
        lp, g = value_and_grad_fn(q)
        p = p + 0.5 * eps * np.asarray(g)
        return q, p, float(lp)

    def build_tree(q, p, log_u, v, depth, eps, h0):
        if depth == 0:
            q1, p1, lp1 = leapfrog(q, p, v * eps)
            joint = lp1 - 0.5 * float(p1 @ p1)
            n1 = int(log_u <= joint)
            s1 = int(log_u < joint + 1000.0) and np.isfinite(joint)
            a1 = min(1.0, math.exp(min(joint - h0, 0.0))) if np.isfinite(joint) else 0.0
            return q1, p1, q1, p1, q1, n1, s1, a1, 1
        qm, pm, qp, pp, q1, n1, s1, a1, na1 = build_tree(
            q, p, log_u, v, depth - 1, eps, h0
        )
        if s1:
            if v == -1:
                qm, pm, _, _, q2, n2, s2, a2, na2 = build_tree(
                    qm, pm, log_u, v, depth - 1, eps, h0
                )
            else:
                _, _, qp, pp, q2, n2, s2, a2, na2 = build_tree(
                    qp, pp, log_u, v, depth - 1, eps, h0
                )
            if n1 + n2 > 0 and rng.random() < n2 / (n1 + n2):
                q1 = q2
            a1, na1 = a1 + a2, na1 + na2
            dq = qp - qm
            s1 = s2 and (dq @ pm >= 0) and (dq @ pp >= 0)
            n1 = n1 + n2
        return qm, pm, qp, pp, q1, n1, s1, a1, na1

    samples = []
    accept_stats = []
    total = num_warmup + num_samples
    for t in range(total):
        p0 = rng.standard_normal(D)
        lp0, _ = value_and_grad_fn(q)
        h0 = float(lp0) - 0.5 * float(p0 @ p0)
        log_u = h0 + math.log(rng.random() + 1e-300)

        qm, qp, pm, pp = q.copy(), q.copy(), p0.copy(), p0.copy()
        n, s, depth = 1, True, 0
        alpha, n_alpha = 0.0, 1
        while s and depth < max_treedepth:
            v = 1 if rng.random() < 0.5 else -1
            if v == -1:
                qm, pm, _, _, q1, n1, s1, a, na = build_tree(
                    qm, pm, log_u, v, depth, eps, h0
                )
            else:
                _, _, qp, pp, q1, n1, s1, a, na = build_tree(
                    qp, pp, log_u, v, depth, eps, h0
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
