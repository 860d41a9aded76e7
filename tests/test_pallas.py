"""Pallas kernel correctness vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_factor_matmul_matches_dot():
    from lanczosplusplus_tpu.ops import pallas_kernels as pk
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((300, 257)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((123, 257)).astype(np.float32))
    try:
        got = pk.factor_matmul(x, a, tile_m=128, tile_n=128, tile_k=128)
    except Exception as e:
        pytest.skip(f"pallas unavailable on this backend: {e}")
    expect = x @ a.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-4)


def test_ell_spmv_fallback_matches():
    from lanczosplusplus_tpu.ops import pallas_kernels as pk
    rng = np.random.default_rng(1)
    dim, k = 500, 7
    diag = jnp.asarray(rng.standard_normal(dim).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, dim, size=(dim, k)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((dim, k)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(dim).astype(np.float32))
    got = pk.ell_spmv_or_fallback(diag, cols, vals, x)
    expect = diag * x + jnp.sum(vals * x[cols], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-4)


def test_matvec_pallas_matches_matvec():
    """The Pallas-routed dense-factor matvec equals the XLA path (on
    CPU Pallas interprets; on TPU it compiles to Mosaic)."""
    import numpy as np
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model

    nsite = 8
    text = f"""
TotalNumberOfSites={nsite}
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU {nsite} {" ".join(["4"] * nsite)}
potentialV {2 * nsite} {" ".join(["0"] * 2 * nsite)}
SolverOptions=none
TargetElectronsUp={nsite // 2}
TargetElectronsDown={nsite // 2}
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    ham = model.hamiltonian(model.create_basis((4, 4)),
                            dtype=np.float32).densify_factors()
    assert ham.factorized.up_dense is not None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ham.dim), jnp.float32)
    y_xla = np.asarray(ham.matvec(x))
    y_pl = np.asarray(ham.matvec_pallas(x))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4 * np.abs(
        y_xla).max())
