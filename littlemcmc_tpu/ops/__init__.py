"""Pallas TPU kernels for hot model-zoo ops and the trajectory fast path.

The sampler's inner loop alternates tiny elementwise phase-space updates
(which XLA fuses well) with the user model's ``logp+grad``. For the
built-in model families the model call is the FLOPs hot spot, so it gets
hand-fused Pallas kernels that compute the value and the gradient in a
single pass over the operands (one MXU matmul instead of a
forward+backward pair, logp recovered from the gradient for free).

:mod:`.nuts_trajectory_pallas` goes further: the *entire* NUTS
tree-building trajectory of a transition runs as one Pallas kernel with
the merge stack in VMEM and the model inlined — the highest-throughput
path for models expressible in Pallas (see
``build_nuts_kernel(..., trajectory_spec=...)``).
"""

from .autospec import make_pallas_model_spec, probe_spec, stable_substitute
from .gaussian_pallas import quadform_logp_grad
from .nuts_trajectory_pallas import PallasModelSpec, build_trajectory_op

__all__ = [
    "quadform_logp_grad",
    "PallasModelSpec",
    "build_trajectory_op",
    "make_pallas_model_spec",
    "probe_spec",
    "stable_substitute",
]
