"""Ainur input format (documented subset; PsimagLite InputNg reads
both formats, the reference's code touches Ainur only at
quasiparticleWeightZ.cpp:133)."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine

AINUR = """##Ainur1.0
TotalNumberOfSites=4;
NumberOfTerms=1;
gt0:DegreesOfFreedom=1;
gt0:GeometryKind="chain";
gt0:GeometryOptions="ConstantValues";
gt0:dir0:Connectors=[-1.0];
Model="HubbardOneBand";
vector hubbardU=[0, 0, 0, 0];
vector potentialV=[0, 0, 0, 0, 0, 0, 0, 0];
SolverOptions="none";
integer TargetElectronsUp=2;
TargetElectronsDown=2;
IsPeriodicX=1;
"""

LEGACY = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4 0 0 0 0
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=1
"""


def test_ainur_parses_labels():
    inp = parse_input(AINUR)
    assert inp.integer("TotalNumberOfSites") == 4
    assert inp.string("Model") == "HubbardOneBand"
    assert inp.vector("hubbardU") == [0, 0, 0, 0]
    assert inp.string("GeometryKind") == "chain"
    assert inp.vector("Connectors") == [-1.0]


def test_ainur_matches_legacy_energy():
    es = []
    for text in (AINUR, LEGACY):
        inp = parse_input(text)
        model = build_model(inp, Geometry(inp))
        eng = Engine(model, inp)
        es.append(eng.ground_energy)
    # U=0 half-filled 4-site PBC chain: E0 = -4 (levels -2, 0, 0, 2)
    assert es[0] == pytest.approx(-4.0, abs=1e-6)
    assert es[0] == pytest.approx(es[1], abs=1e-9)


def test_ainur_matrix_label():
    text = AINUR + 'matrix SpinOrbit=[[1, 0, 0, 1], [0, 1, 1, 0], ' \
                   '[0, 0, 1, 1], [1, 1, 0, 0]];\n'
    inp = parse_input(text)
    m = inp.matrix("SpinOrbit")
    assert len(m) == 4 and len(m[0]) == 4


def test_ainur_two_terms_ladder():
    text = """##Ainur1.0
TotalNumberOfSites=8;
NumberOfTerms=1;
gt0:DegreesOfFreedom=1;
gt0:GeometryKind="ladder";
gt0:LadderLeg=2;
gt0:GeometryOptions="ConstantValues";
gt0:dir0:Connectors=[-1.0];
gt0:dir1:Connectors=[-0.6];
Model="HubbardOneBand";
vector hubbardU=[1, 1, 1, 1, 1, 1, 1, 1];
vector potentialV=[0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0];
SolverOptions="none";
TargetElectronsUp=2;
TargetElectronsDown=2;
IsPeriodicX=0;
"""
    inp = parse_input(text)
    assert inp.vector("Connectors") == [-1.0, -0.6]
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    assert np.isfinite(eng.ground_energy)


def test_ainur_expression_forms_raise_at_the_subset_boundary():
    """`![...]` expressions / include forms are outside the documented
    subset (PsimagLite-only semantics): loud error, never a mis-parse."""
    import pytest
    from lanczosplusplus_tpu.io_.ainur import parse_ainur

    for text in ('##Ainur1.0\nFiniteLoops=![7, [100, 0.5, 0]];\n',
                 '##Ainur1.0\ninclude "other.ain";\n'):
        with pytest.raises(ValueError, match="subset"):
            parse_ainur(text)
