"""Cross-model property sweep: for randomized small configurations of
every model family assert (a) hermiticity, (b) matvec == dense,
(c) Lanczos ground energy == dense eigh."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.solver import lanczos as lz


def cases():
    rng = np.random.default_rng(42)
    out = []
    for trial in range(3):
        u, v1, v2 = rng.uniform(-1, 4, 3).round(2)
        t, j = rng.uniform(-1.5, 1.5, 2).round(2)
        out.append(("hubbard", f"""
TotalNumberOfSites=5
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {t}
Model=HubbardOneBand
hubbardU 5 {u} {u} {v1} {u} {u}
potentialV 10 {v1} {v2} 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=3
IsPeriodicX={trial % 2}
"""))
        out.append(("heisenberg", f"""
TotalNumberOfSites=5
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {j}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {t}
Model=Heisenberg
HeisenbergTwiceS={1 + trial % 2}
SolverOptions=none
TargetSzPlusConst={2 + trial}
IsPeriodicX={(trial + 1) % 2}
"""))
        out.append(("tj", f"""
TotalNumberOfSites=5
NumberOfTerms=4
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {t}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {j}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {j}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {v2}
Model=TjMultiOrb
Orbitals=1
potentialV 10 {v1} 0 0 0 {v2} 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX={trial % 2}
"""))
    return out


@pytest.mark.parametrize("name,text", cases())
def test_model_properties(name, text):
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(model.default_parts(inp))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-12,
                               err_msg=f"{name} not hermitian")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(basis.size)
    np.testing.assert_allclose(np.asarray(ham.matvec(x)), dense @ x,
                               atol=1e-10)
    evals, _ = lz.lowest_states(ham, max_steps=150)
    expect = np.linalg.eigvalsh(dense)[0]
    assert evals[0] == pytest.approx(expect, abs=1e-8)
