"""Maximum-likelihood learning of factor-graph potentials on TPU.

Because propagation is pure JAX, the log-partition function is exactly
differentiable: grad(logZ) w.r.t. per-factor log-potentials equals the
model's expected sufficient statistics (normalized factor marginals).  So
maximum-likelihood fitting of an MRF to data is plain gradient ascent on

    L(theta) = sum_f <empirical_marginal_f, theta_f> - logZ(theta)

whose gradient is (empirical moments - model moments) — moment matching.
The reference (NumPy, inference-only) has no learning story at all.

Uses the rescaled posterior machinery for stability and optax if available
(plain SGD fallback otherwise)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .executor import evaluate_cliques, factor_marginals, partition, propagate_cliques
from .schedule import Plan


def empirical_marginals(
    plan: Plan, data: np.ndarray
) -> List[np.ndarray]:
    """Per-factor empirical frequency tables from complete data.

    data: [N, num_vars] int array (columns indexed by interned var id)."""
    N = data.shape[0]
    out = []
    for fvars in plan.factors:
        shape = tuple(plan.sizes[v] for v in fvars)
        if not fvars:
            out.append(np.ones(()))
            continue
        idx = tuple(data[:, v] for v in fvars)
        flat = np.ravel_multi_index(idx, shape)
        counts = np.bincount(flat, minlength=int(np.prod(shape)))
        out.append(counts.reshape(shape) / N)
    return out


def _logz(plan: Plan, thetas: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """logZ via rescaled linear-space propagation (stable at any model
    size; plain linear Z over/underflows float32 beyond ~100 variables)."""
    from .executor import batched_propagate_program

    prog = batched_propagate_program(plan, observed=[], rescale=True)
    vals = [jnp.exp(t) for t in thetas]
    pots = evaluate_cliques(plan, vals)
    _, logz = prog(pots, [])
    return logz[0]


def log_likelihood(plan: Plan, thetas: Sequence[jnp.ndarray],
                   emp: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Average complete-data log-likelihood under log-potentials theta."""
    lin = sum(jnp.vdot(m, t) for m, t in zip(emp, thetas))
    return lin - _logz(plan, thetas)


def fit_mle(
    plan: Plan,
    data: np.ndarray,
    steps: int = 200,
    learning_rate: float = 0.5,
    init_thetas: Optional[Sequence[np.ndarray]] = None,
    verbose: bool = False,
) -> Tuple[List[np.ndarray], List[float]]:
    """Fit factor log-potentials to complete data by gradient ascent.

    Returns (thetas, per-step average log-likelihoods).  Exact moment
    matching: at convergence the model's factor marginals equal the
    empirical tables."""
    emp = [jnp.asarray(m) for m in empirical_marginals(plan, data)]
    if init_thetas is None:
        thetas = [
            jnp.zeros(tuple(plan.sizes[v] for v in f)) for f in plan.factors
        ]
    else:
        thetas = [jnp.asarray(t) for t in init_thetas]

    loss_grad = jax.jit(
        jax.value_and_grad(lambda th: -log_likelihood(plan, th, emp))
    )

    try:
        import optax

        opt = optax.adam(learning_rate * 0.2)
        state = opt.init(thetas)

        @jax.jit
        def step(thetas, state):
            loss, g = jax.value_and_grad(
                lambda th: -log_likelihood(plan, th, emp)
            )(thetas)
            updates, state = opt.update(g, state)
            return optax.apply_updates(thetas, updates), state, loss

        history = []
        for i in range(steps):
            thetas, state, loss = step(thetas, state)
            history.append(-float(loss))
            if verbose and i % 20 == 0:
                print(f"step {i}: avg loglik {-float(loss):.6f}")
    except ImportError:  # plain gradient ascent
        history = []
        for i in range(steps):
            loss, g = loss_grad(thetas)
            thetas = [t - learning_rate * gi for t, gi in zip(thetas, g)]
            history.append(-float(loss))

    return [np.asarray(t) for t in thetas], history


def model_marginals(plan: Plan, thetas: Sequence[jnp.ndarray]) -> List[np.ndarray]:
    """Normalized per-factor marginals of the model exp(theta)."""
    vals = [jnp.exp(jnp.asarray(t)) for t in thetas]
    pots = evaluate_cliques(plan, vals)
    beliefs, _ = propagate_cliques(plan, pots)
    z = partition(plan, beliefs)
    return [np.asarray(m / z) for m in factor_marginals(plan, beliefs)]
