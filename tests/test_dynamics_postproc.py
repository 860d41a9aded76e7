"""Tests for S(q,w) assembly, N(i,w), quasiparticle Z(k), dynamics1."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu import postproc
from lanczosplusplus_tpu.engine.dynamics import (
    quasiparticle_weight_z, dynamics1_spectral)

HEIS6 = """
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=Heisenberg
HeisenbergTwiceS=1
SolverOptions=none
TargetSzPlusConst=3
IsPeriodicX=1
"""

HUB4 = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4
0 0 0 0
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=1
"""


def make_engine(text):
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return Engine(model, inp)


def test_niomega_sum_rule():
    eng = make_engine(HUB4)
    omegas = np.linspace(-12, 12, 2401)
    dos = postproc.ni_omega(eng, omegas, 0.15)
    # each site integrates to 1 (one spin species)
    for i in range(4):
        assert np.trapezoid(dos[i], omegas) == pytest.approx(1.0,
                                                             abs=0.05)


def test_sq_omega_total_sum_rule():
    """S(q,w) with sz operator: sum over q and integral over w>0 of
    -Im/pi relates to <Sz_c Sz_i> correlations; check q=0 vanishes for
    an Sz=0 ground state."""
    eng = make_engine(HEIS6)
    omegas = np.linspace(-0.5, 6, 400)
    qs, sqw = postproc.sq_omega(eng, "sz", omegas, 0.08)
    intens = -sqw.imag / np.pi
    # q=0 total-Sz operator annihilates the Sz=0 singlet ground state:
    # spectral weight at q=0 ~ 0
    w0 = np.trapezoid(intens[0], omegas)
    wpi = np.trapezoid(intens[3], omegas)  # q=pi
    assert abs(w0) < 0.02
    assert wpi > 0.1  # antiferromagnetic peak at q=pi


def test_quasiparticle_z_free_fermions():
    """U=0: the N-1 ground state is the Fermi sea minus the highest
    occupied level; c_k on |gs_N> has |overlap|^2 = 1 for that k."""
    eng = make_engine(HUB4)
    zs = quasiparticle_weight_z(eng, spin=0, ratio=True)
    assert len(zs) == 4
    vals = np.array([z for (_, z) in zs])
    # ratios are in [0, 1]; at least one k has Z ~ 1 (free fermions)
    assert vals.max() == pytest.approx(1.0, abs=1e-6)
    assert (vals >= -1e-9).all() and (vals <= 1 + 1e-9).all()


def test_dynamics1_feas():
    text = """
TotalNumberOfSites=2
Model=FeAsBasedSc
FeAsMode=INT_PAPER33
NumberOfTerms=1
DegreesOfFreedom=2
Orbitals=2
GeometryKind=chain
GeometryOptions=ConstantValues
SolverOptions=none
hubbardU 4 1.0 0.5 -0.2 -0.1
Connectors 2 2
-1.0 0.2
0.2 -0.7
potentialV 8
0 0 0 0 0 0 0 0
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""
    eng = make_engine(text)
    cf = dynamics1_spectral(eng, m_for_k=1)
    omegas = np.linspace(-2, 8, 200)
    g = cf.evaluate(omegas, 0.1)
    assert np.isfinite(g).all()
    # spectral weight is non-negative (bosonic type-0 CF)
    assert (-g.imag >= -1e-9).all()
    # weight equals <phi|phi>
    assert cf.weight >= 0


def test_feas_sq_omega():
    """BASELINE config 4: S(q, omega) on the two-orbital FeBasedSc
    model (sz channel)."""
    text = """
TotalNumberOfSites=4
Model=FeAsBasedSc
FeAsMode=INT_PAPER33
NumberOfTerms=1
DegreesOfFreedom=2
Orbitals=2
GeometryKind=chain
GeometryOptions=ConstantValues
SolverOptions=none
hubbardU 4 2.0 1.0 -0.4 -0.2
Connectors 2 2
-1.0 0.1
0.1 -0.6
potentialV 16
0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=1
"""
    eng = make_engine(text)
    omegas = np.linspace(-0.5, 8, 200)
    qs, sqw = postproc.sq_omega(eng, "sz", omegas, 0.1)
    intens = -sqw.imag / np.pi
    assert np.isfinite(intens).all()
    # q=0 weight vanishes for the Sz-conserving ground state
    w0 = np.trapezoid(intens[0], omegas)
    wpi = np.trapezoid(intens[2], omegas)
    assert abs(w0) < 0.03
    assert wpi > 0.01
