"""Chebyshev real-time propagation vs the dense-eigh propagator."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine.chebyshev_time import (
    evolve, autocorrelation)

HUB = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4 4 4 4 4
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""


def setup():
    inp = parse_input(HUB)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis, dtype=np.float64)
    dense = np.asarray(ham.to_dense())
    return ham, dense


def test_evolve_matches_dense_propagator():
    ham, dense = setup()
    evals, evecs = np.linalg.eigh(dense)
    rng = np.random.default_rng(0)
    psi0 = rng.standard_normal(ham.dim)
    psi0 /= np.linalg.norm(psi0)
    times = np.asarray([0.0, 0.5, 2.0, 7.0])
    got = evolve(ham, psi0, times)
    c = evecs.T @ psi0
    for i, t in enumerate(times):
        exact = evecs @ (np.exp(-1j * evals * t) * c)
        np.testing.assert_allclose(got[i], exact, atol=1e-9)
    # unitarity
    norms = np.linalg.norm(got, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)


def test_autocorrelation_fourier_peaks():
    """|C(t)|'s Fourier transform peaks at the eigenvalues carrying
    weight in psi0."""
    ham, dense = setup()
    evals, evecs = np.linalg.eigh(dense)
    psi0 = evecs[:, 0] * np.sqrt(0.5) + evecs[:, 5] * np.sqrt(0.5)
    times = np.asarray([1.0, 3.0])
    c = autocorrelation(ham, psi0, times)
    exact = np.asarray([0.5 * np.exp(-1j * evals[0] * t) +
                        0.5 * np.exp(-1j * evals[5] * t) for t in times])
    np.testing.assert_allclose(c, exact, atol=1e-9)
