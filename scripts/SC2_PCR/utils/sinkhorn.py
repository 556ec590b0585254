"""Sinkhorn optimal-transport matching (reference
scripts/SC2_PCR/utils/sinkhorn.py:9-80) in jnp — auxiliary matcher."""
import jax
import jax.numpy as jnp


def log_sinkhorn_iterations(z, log_mu, log_nu, iters: int):
    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - jax.nn.logsumexp(z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(z + u[:, None], axis=0)
    return z + u[:, None] + v[None, :]


def log_optimal_transport(scores, alpha, iters: int):
    """Differentiable OT with a dustbin row/col (SuperGlue-style), the
    formulation the reference's sinkhorn util implements."""
    m, n = scores.shape
    one = jnp.ones(())
    ms, ns = one * m, one * n
    bins0 = jnp.full((m, 1), alpha)
    bins1 = jnp.full((1, n), alpha)
    alpha_c = jnp.full((1, 1), alpha)
    couplings = jnp.block([[scores, bins0], [bins1, alpha_c]])
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((m,), norm),
                              jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate([jnp.full((n,), norm),
                              jnp.log(ms)[None] + norm])
    z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return z - norm
