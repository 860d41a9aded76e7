"""extractOrbitals.pl / dynamicsFt.pl equivalents."""

import numpy as np

from lanczosplusplus_tpu.engine.spectral import (
    ContinuedFraction, ContinuedFractionCollection, read_collection)
from lanczosplusplus_tpu.postproc import extract_orbitals, dynamics_ft


def _cf(weight, meta=""):
    return ContinuedFraction(
        alphas=np.array([0.5, 1.0]), betas=np.array([0.0, 0.3]),
        e0=-1.0, weight=weight, sigma=1, meta=meta)


def _write(path, cfs, center=None):
    with open(path, "w") as f:
        if center is not None:
            f.write(f"TSPCenter={center}\n")
        coll = ContinuedFractionCollection(list(cfs))
        coll.write(f, index_to_cf=[c.meta for c in cfs])


def test_extract_orbitals(tmp_path):
    p = tmp_path / "a.comb"
    cfs = [_cf(1.0, "0,0,0,0"), _cf(2.0, "0,0,0,1"),
           _cf(3.0, "0,1,0,1"), _cf(4.0, "0,0,1,1")]
    _write(p, cfs)
    sel = extract_orbitals(str(p), 0, 1)
    assert len(sel.items) == 2
    assert sorted(cf.weight for cf in sel.items) == [2.0, 3.0]
    sel2 = extract_orbitals(str(p), 1, 0)   # either order matches
    assert len(sel2.items) == 2


def test_dynamics_ft(tmp_path):
    nsites = 4
    center = 1
    paths = []
    for i in range(nsites):
        p = tmp_path / f"root{i}.comb"
        _write(p, [_cf(1.0 + 0.5 * i, "0,0,0,0")], center=center)
        paths.append(str(p))
    omegas = np.linspace(-3, 3, 11)
    ks, grid = dynamics_ft(paths, nsites, omegas, 0.1)
    assert grid.shape == (nsites, len(omegas))
    # manual check at one momentum
    m = 1
    k = 2 * np.pi * m / nsites
    acc = np.zeros(len(omegas), dtype=np.complex128)
    for i, p in enumerate(paths):
        acc += np.exp(1j * k * (i - center)) * \
            read_collection(p).evaluate(omegas, 0.1)
    np.testing.assert_allclose(grid[m], acc.real, atol=1e-12)
    # k = 0 is the plain sum
    acc0 = sum(read_collection(p).evaluate(omegas, 0.1) for p in paths)
    np.testing.assert_allclose(grid[0], acc0.real, atol=1e-12)
