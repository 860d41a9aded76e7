"""Global numeric configuration.

The reference is double precision throughout (reference:
src/Engine/LanczosDriver.h:29-33, RealType = double unless USE_FLOAT).
On TPU we default to float32 + full reorthogonalization and make the
dtype an explicit knob; CPU tests run float64 for reference-tolerance
checks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def default_real_dtype():
    """float64 when x64 is enabled (CPU tests), else float32 (TPU)."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def complex_dtype_for(real_dtype) -> jnp.dtype:
    return jnp.dtype(jnp.complex128 if jnp.dtype(real_dtype) == jnp.float64
                     else jnp.complex64)


@dataclasses.dataclass
class Config:
    """Solver configuration (reference: PsimagLite ParametersForSolver read
    from the input file, used at src/Engine/Engine.h:60-65)."""

    lanczos_steps: int = 200
    lanczos_eps: float = 1e-12
    seed: int = 7239443
    use_complex: bool = False
    real_dtype: object = None

    def __post_init__(self):
        if self.real_dtype is None:
            self.real_dtype = default_real_dtype()

    @property
    def scalar_dtype(self):
        if self.use_complex:
            return complex_dtype_for(self.real_dtype)
        return jnp.dtype(self.real_dtype)
