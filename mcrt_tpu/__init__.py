"""mcrt_tpu — a TPU-native differentiable Monte Carlo path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
OpenCL wavefront renderer (compix/Monte-Carlo-Raytracer), re-designed
TPU-first: the bounce loop is one jitted XLA program, intersection runs in
Pallas kernels, distribution is a `jax.sharding.Mesh`, and the whole renderer
differentiates end-to-end.  See SURVEY.md for the reference analysis this
build follows.
"""

from .config import (
    AccelType,
    FilterType,
    IntegratorType,
    RenderConfig,
    SamplerType,
)
from .renderer import Renderer

__version__ = "0.1.0"

__all__ = [
    "AccelType",
    "FilterType",
    "IntegratorType",
    "RenderConfig",
    "Renderer",
    "SamplerType",
]
