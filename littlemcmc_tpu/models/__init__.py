"""Benchmark / test model zoo.

The reference ships no models (the user supplies ``logp_dlogp_func``);
these are the five BASELINE.json configs plus the cross-framework test
model, implemented as JAX-native log-densities with analytic gradients
where that saves work. Each model is a plain object with ``ndim``,
``logp(q)`` and ``logp_grad(q) -> (logp, grad)``; pass ``model.logp_grad``
directly to ``sample(logp_dlogp_func=...)``.
"""

from .gaussian import StandardNormal, CorrelatedGaussian, SpikedGaussian
from .funnel import NealsFunnel, NonCenteredFunnel
from .logistic import LogisticRegression, german_credit_synthetic
from .eight_schools import EightSchools
from .linear import LinearRegression
from .hierarchical import HierarchicalRegression
from .stochvol import StochasticVolatility

__all__ = [
    "StandardNormal",
    "CorrelatedGaussian",
    "SpikedGaussian",
    "NealsFunnel",
    "NonCenteredFunnel",
    "LogisticRegression",
    "german_credit_synthetic",
    "EightSchools",
    "LinearRegression",
    "HierarchicalRegression",
    "StochasticVolatility",
]
