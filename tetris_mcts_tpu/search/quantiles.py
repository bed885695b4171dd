"""Closed-form quantile approximations used as exploration coefficients.

TPU-native equivalents of the reference's numba @vectorize functions
(`agents/special.py`, C++ twins `agents/cppmodule/special.h`), implemented as
pure jnp so they fuse into the selection program. The formulas are from the
papers cited in the reference docstrings:

- `norm_quantile`: Epure, "Very Simply Explicitly Invertible Approximations of
  Normal Cumulative and Normal Quantile Function", AMS 2014 (85-88).
- `std_quantile2`: Koehler, "A Simple Approximation for the Percentiles of the
  t Distribution", Technometrics 25(1), 1983.

Deviation from the reference (documented): inputs are clamped so the
approximations stay finite at t <= 1 — the reference relies on NaN propagation
through argmax for those corner cases (SURVEY.md Appendix A lists this family
of accidental behaviours as not-to-replicate).
"""

import jax.numpy as jnp

_LOG2 = float(jnp.log(2.0))
_LOG22 = float(jnp.log(22.0))
_LOG41 = float(jnp.log(41.0))


def norm_quantile(t):
    """Standard-normal quantile at probability 1 - 1/t (`special.py:56-66`)."""
    t = jnp.maximum(jnp.asarray(t, jnp.float32), 2.0)
    alpha = 1.0 - 1.0 / t
    q = (
        10.0
        * jnp.log(1.0 - jnp.log(-jnp.log(alpha) / _LOG2) / _LOG22)
        / _LOG41
    )
    return q


def std_quantile2(nu, t):
    """Student-t quantile (Koehler 1983 approximation, `special.py:31-52`)."""
    nu = jnp.maximum(jnp.asarray(nu, jnp.float32), 1.0)
    t = jnp.maximum(jnp.asarray(t, jnp.float32), 2.0)
    alpha = 2.0 / t
    f_nu = 1.0 / (nu + 1.0)
    g_alpha = 1.0 / jnp.sqrt(-jnp.log(alpha * (2.0 - alpha)))
    h_nu_alpha = jnp.power(2.0 * alpha * jnp.sqrt(nu), 1.0 / nu)
    t_inv = -0.0953 - 0.631 * f_nu + 0.81 * g_alpha + 0.076 * h_nu_alpha
    return 1.0 / t_inv


def bayes_quantile(nu, t):
    """`std_quantile2` restricted to its valid regime, for Bayes-UCB bounds.

    Koehler's approximation has a pole (its inverse crossing zero) at small
    nu and large t — e.g. std_quantile2(1, 200) ~ -7.5e4, and NEGATIVE for
    larger t — a regime the reference never evaluates because
    `select_index_bayes` routes children with visits < min_n (default 10)
    to the random-low path before the formula runs (core.py:290-351). The
    clip keeps the bound exploratory (>= 0) and finite even if a caller
    lowers the low threshold into that regime; near the pole the huge
    positive bound makes the child get visited, which moves nu out of the
    bad regime (self-correcting rather than anti-selecting)."""
    return jnp.clip(std_quantile2(nu, t), 0.0, 1e3)


def std_quantile(nu, t):
    """Student-t quantile via the gamma-function approximation
    (`special.py:10-27`)."""
    import jax.scipy.special as jsp

    nu = jnp.asarray(nu, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    nu_half = nu / 2.0
    factor = jnp.exp(jsp.gammaln(nu_half - 0.5) - jsp.gammaln(nu_half))
    nomin = jnp.power(nu, nu_half)
    denom = 2.0 * jnp.sqrt(jnp.pi)
    c = nomin / denom * factor
    return jnp.power(c * t, 1.0 / nu)
