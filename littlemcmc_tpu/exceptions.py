"""Exceptions (parity with reference ``littlemcmc/exceptions.py:22-25``)."""

__all__ = ["SamplingError", "IntegrationError"]


class SamplingError(RuntimeError):
    """Error while sampling."""


class IntegrationError(RuntimeError):
    """Numerical errors during leapfrog integration.

    Kept for API parity with the reference (``integration.py:28-31``); the
    TPU integrator never raises it — non-finite values propagate through
    divergence masks instead.
    """
