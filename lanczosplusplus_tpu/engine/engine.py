"""Engine: sector diagonalization + observables orchestration.

Functional re-design of the reference Engine (reference:
src/Engine/Engine.h:84-98 ctor diagonalizes; 601-657
computeAllStatesBelow; observable entry points 113-389).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lanczosplusplus_tpu.config import Config
from lanczosplusplus_tpu.solver import lanczos as lz


class Engine:
    """Diagonalizes the target sector on construction and serves
    energies/eigenvectors plus observable calculations."""

    def __init__(self, model, inp, config: Config | None = None):
        self.model = model
        self.inp = inp
        self.config = config or Config(
            use_complex="useComplex" in inp.solver_options())
        self.excited = inp.integer("Excited", default=0)
        self.parts = model.default_parts(inp)
        self.basis = model.create_basis(self.parts)
        self.hamiltonian = model.hamiltonian(
            self.basis, dtype=self.config.scalar_dtype)
        nstates = self.excited + 1
        self._energies, self._vectors = lz.lowest_states(
            self.hamiltonian, num_states=nstates,
            seed=self.config.seed, max_steps=self.config.lanczos_steps)

    def energies(self, i: int = 0) -> float:
        return float(self._energies[i])

    def eigenvector(self, i: int = 0):
        return self._vectors[i]

    @property
    def ground_energy(self) -> float:
        return self.energies(0)
