"""Pallas TPU kernels for hot model-zoo ops.

The sampler's inner loop alternates tiny elementwise phase-space updates
(which XLA fuses well) with the user model's ``logp+grad``. For the
built-in model families the model call is the FLOPs hot spot, so it gets
hand-fused Pallas kernels that compute the value and the gradient in a
single pass over the operands (one MXU matmul instead of a
forward+backward pair, logp recovered from the gradient for free).
"""

from .gaussian_pallas import quadform_logp_grad

__all__ = ["quadform_logp_grad"]
