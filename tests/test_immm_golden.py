"""Immm ktwoniffour falsifiability golden (VERDICT round-1 item 10).

Two claims, each testable in minutes in a future environment where the
PsimagLite KTwoNiFFour sources exist:

1. The reconstructed K2NiF4 connector table is pinned down exactly by
   the dumpmatrix-style golden recorded in
   docs/immm_ktwoniffour_golden.md (dense H eigenvalues of a 6-site,
   2-cell cluster).
2. The exact-override path works end-to-end: the SAME Hamiltonian is
   reproduced by an `OrbsPerSite` + `GeometryKind=longrange` input
   carrying the connector table explicitly — so PsimagLite's true
   table, once recovered, drops in verbatim with no code changes.
"""

import numpy as np

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model

NSITE = 6  # two [O_x, O_y, Cu] cells
KTWON = f"""
TotalNumberOfSites={NSITE}
NumberOfTerms=2
DegreesOfFreedom=2
GeometryKind=ktwoniffour
GeometryOptions=ConstantValues
Connectors 2 2
-1.0 -0.4
-0.4 -0.7
DegreesOfFreedom=1
GeometryKind=ktwoniffour
GeometryOptions=ConstantValues
Connectors 1 0.8
Model=Immm
hubbardU {NSITE} 3 3 3 3 3 3
potentialV {NSITE} 0.2 0.2 0.2 0.2 0.2 0.2
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""

# reconstructed-cluster golden (docs/immm_ktwoniffour_golden.md):
# lowest 8 eigenvalues of the dense (2, 2)-sector Hamiltonian
GOLDEN_EVALS = None  # filled below from the doc at test time


def _dense(inp_text):
    inp = parse_input(inp_text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    return model.hamiltonian(basis).to_dense(), geom, model


def _longrange_equivalent(geom, model):
    """Rebuild the ktwoniffour cluster via OrbsPerSite + longrange
    connectors carrying the reconstruction's own coupling tensors."""
    n = NSITE
    hop = geom.coupling_tensor(0)              # (n, n, 2, 2)
    upd = geom.coupling_tensor(1)[:, :, 0, 0]  # (n, n)
    dof = hop.shape[2]
    flat_hop = hop.transpose(0, 2, 1, 3).reshape(n * dof, n * dof)

    def mat_text(m):
        rows = "\n".join(" ".join(f"{v:.10g}" for v in row)
                         for row in m)
        return f"Connectors {m.shape[0]} {m.shape[1]}\n{rows}"

    text = f"""
TotalNumberOfSites={n}
NumberOfTerms=2
DegreesOfFreedom=2
GeometryKind=longrange
GeometryOptions=none
{mat_text(flat_hop)}
DegreesOfFreedom=1
GeometryKind=longrange
GeometryOptions=none
{mat_text(upd)}
Model=Immm
OrbsPerSite {n} 2 2 1 2 2 1
hubbardU {n} 3 3 3 3 3 3
potentialV {n} 0.2 0.2 0.2 0.2 0.2 0.2
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""
    return text


def test_override_path_reproduces_reconstruction():
    dense_k, geom, model = _dense(KTWON)
    text = _longrange_equivalent(geom, model)
    dense_lr, _, _ = _dense(text)
    np.testing.assert_allclose(dense_lr, dense_k, atol=1e-10)


def test_golden_eigenvalues_documented():
    """The doc's recorded spectrum matches the built Hamiltonian."""
    import re

    import os

    dense_k, _, _ = _dense(KTWON)
    evals = np.linalg.eigvalsh(dense_k)[:8]
    doc_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "immm_ktwoniffour_golden.md")
    with open(doc_path) as f:
        doc = f.read()
    documented = [float(x) for x in re.findall(
        r"^\s*E\[\d+\]\s*=\s*([-\d.eE+]+)", doc, re.M)]
    assert len(documented) == 8
    np.testing.assert_allclose(evals, documented, atol=1e-9)
