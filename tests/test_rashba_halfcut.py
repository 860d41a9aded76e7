"""Half-cut factorized Rashba vs the flat ELL Hamiltonian."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.models.rashba_halfcut import build_halfcut_rashba

RASHBA = """
TotalNumberOfSites={n}
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {t}
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {r}
Model=HubbardOneBandRashbaSOC
hubbardU {n} {us}
potentialV {n2} {vs}
SolverOptions=none
TargetElectronsTotal={ne}
IsPeriodicX={pbc}
"""


def setup(n=5, ne=5, t=-1.0, r=0.5, u=4.0, pbc=1):
    us = " ".join([str(u)] * n)
    vs = " ".join(["0.1", "-0.2"] + ["0"] * (2 * n - 2))
    inp = parse_input(RASHBA.format(n=n, ne=ne, t=t, r=r, us=us,
                                    vs=vs, n2=2 * n, pbc=pbc))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(("ne", ne))
    return model, basis


def _dense_via_matmat(ham):
    """Full dense matrix in ONE batched apply (to_dense's per-column
    matvec loop is too slow for the suite at these dims)."""
    eye = jnp.eye(ham.dim, dtype=ham.dtype)
    return np.asarray(ham.matmat_t(eye)).T


@pytest.mark.parametrize("n,ne,pbc", [(4, 4, 0), (5, 5, 1), (6, 5, 1),
                                      (6, 7, 0)])
def test_halfcut_matches_flat_dense(n, ne, pbc):
    model, basis = setup(n=n, ne=ne, pbc=pbc)
    flat = model.hamiltonian(basis, dtype=np.float64)
    half = build_halfcut_rashba(model, basis, dtype=np.float64)
    assert half.dim == flat.dim
    dense_f = _dense_via_matmat(flat)
    dense_h = _dense_via_matmat(half)
    np.testing.assert_allclose(dense_h, dense_h.T.conj(), atol=1e-12)
    np.testing.assert_allclose(dense_h, dense_f, atol=1e-12)


def test_halfcut_odd_cut_matches():
    model, basis = setup(n=5, ne=4, pbc=1)
    flat = model.hamiltonian(basis, dtype=np.float64)
    half = build_halfcut_rashba(model, basis, dtype=np.float64, cut=3)
    np.testing.assert_allclose(_dense_via_matmat(half),
                               _dense_via_matmat(flat), atol=1e-12)


def test_halfcut_complex_coupling():
    """Complex Rashba connectors (the physical case): hermiticity +
    elementwise equality against the flat path."""
    model, basis = setup(n=5, ne=5, pbc=0)
    model.rashba = model.rashba.astype(np.complex128)
    model.rashba[model.rashba != 0] *= np.exp(0.37j)
    # keep the connector matrix hermitian in the geometry's sense
    # (r[j,i] = conj(r[i,j]))
    r = model.rashba
    iu = np.triu_indices(r.shape[0], 1)
    r[(iu[1], iu[0])] = np.conj(r[iu])
    flat = model.hamiltonian(basis, dtype=np.complex128)
    half = build_halfcut_rashba(model, basis, dtype=np.complex128)
    dense_f = _dense_via_matmat(flat)
    np.testing.assert_allclose(dense_f, dense_f.T.conj(), atol=1e-12)
    np.testing.assert_allclose(_dense_via_matmat(half), dense_f,
                               atol=1e-12)


def test_halfcut_matvec_and_matmat_t():
    model, basis = setup(n=6, ne=6, pbc=1)
    flat = model.hamiltonian(basis, dtype=np.float64)
    half = build_halfcut_rashba(model, basis, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(flat.dim)
    np.testing.assert_allclose(np.asarray(half.matvec(jnp.asarray(x))),
                               np.asarray(flat.matvec(jnp.asarray(x))),
                               atol=1e-11)
    xk = rng.standard_normal((3, flat.dim))
    yk = np.asarray(half.matmat_t(jnp.asarray(xk)))
    for b in range(3):
        np.testing.assert_allclose(
            yk[b], np.asarray(flat.matvec(jnp.asarray(xk[b]))),
            atol=1e-11)


def test_halfcut_lowest_state_f32_refined():
    """f32 half-cut solve + host-f64 refinement matches the f64 flat
    ground energy."""
    from lanczosplusplus_tpu.solver.lanczos import lowest_states

    model, basis = setup(n=6, ne=6, pbc=1)
    flat = model.hamiltonian(basis, dtype=np.float64)
    e_flat, _ = lowest_states(flat, max_steps=200)
    half = build_halfcut_rashba(model, basis, dtype=np.float32)
    e_half, _ = lowest_states(half, max_steps=200)
    # refinement accuracy is bounded by the f32 eigenvector quality
    # (~residual^2); observed ~2e-9 relative
    assert float(e_half[0]) == pytest.approx(float(e_flat[0]),
                                             abs=1e-7)


def test_halfcut_eigenvector_in_flat_order():
    """lowest_states unwraps the PermutedHamiltonian (solves in block
    layout) but must return the eigenvector in FLAT order with the JW
    twist sign applied."""
    from lanczosplusplus_tpu.solver.lanczos import lowest_states

    model, basis = setup(n=5, ne=5, pbc=1)
    flat = model.hamiltonian(basis, dtype=np.float64)
    half = build_halfcut_rashba(model, basis, dtype=np.float64)
    assert half.sign is not None  # the twist is nontrivial here
    e_f, v_f = lowest_states(flat, max_steps=160)
    e_h, v_h = lowest_states(half, max_steps=160)
    assert float(e_h[0]) == pytest.approx(float(e_f[0]), abs=1e-11)
    ov = abs(np.vdot(np.asarray(v_h[0]), np.asarray(v_f[0])))
    assert ov == pytest.approx(1.0, abs=1e-9)
    # and the flat-order residual of the returned vector is tiny
    r = np.asarray(flat.matvec(jnp.asarray(np.asarray(v_h[0])))) \
        - float(e_h[0]) * np.asarray(v_h[0])
    assert np.linalg.norm(r) < 1e-9


def test_col_dedup_groups_present():
    """The hop/Rashba channel pairs of each crossing bond must share a
    (col map, col amp) pair — the round-5 column-gather dedup that cut
    the 13-site scanned matvec 26%.  A builder refactor that silently
    loses the sharing would regress the hot loop."""
    import numpy as np
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.models.rashba_halfcut import \
        build_halfcut_rashba

    term = ("DegreesOfFreedom=1\nGeometryKind=chain\n"
            "GeometryOptions=ConstantValues\nConnectors 1 {v}\n")
    text = ("TotalNumberOfSites=8\nNumberOfTerms=2\n"
            + term.format(v=-1.0) + term.format(v=0.5)
            + "Model=HubbardOneBandRashbaSOC\n"
            + "hubbardU 8 " + " ".join(["4"] * 8) + "\n"
            + "potentialV 16 " + " ".join(["0"] * 16) + "\n"
            + "SolverOptions=none\nTargetElectronsTotal=8\n"
            + "IsPeriodicX=1\n")
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis(("ne", 8))
    ham = build_halfcut_rashba(model, basis, dtype=np.float64)
    nchan = sum(t.row_src.shape[0] for t in ham.inner.perm_cross)
    ncolgroups = sum(len(t.col_groups) for t in ham.inner.perm_cross)
    assert ncolgroups * 2 == nchan, (ncolgroups, nchan)
