"""Lanczos checkpoint/resume tests."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.solver import lanczos as lz


def build_ham(dtype=np.float64):
    text = """
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 8
4 4 4 4 4 4 4 4
potentialV 16
0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=4
TargetElectronsDown=4
IsPeriodicX=1
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return model.hamiltonian(model.create_basis((4, 4)), dtype=dtype)


def test_checkpoint_resume_identical(tmp_path):
    ham = build_ham()
    v0 = lz.random_start_vector(ham.dim, 123, np.float64)
    ref = lz.tridiagonalize(ham, v0, 60)

    ck = str(tmp_path / "lz.npz")
    # run partially (3 chunks of 10 = 30 steps), abort, then resume
    import lanczosplusplus_tpu.solver.lanczos as L
    V, a, b = None, None, None
    # simulate interruption: run with a tiny steps target first to
    # populate the checkpoint, then full resume
    partial_res = L._lanczos_scan(ham, v0, 60, checkpoint=ck, chunk=13)
    res2 = lz.tridiagonalize(ham, v0, 60, checkpoint=ck, chunk=13)
    np.testing.assert_allclose(res2.alphas, ref.alphas, atol=1e-10)
    np.testing.assert_allclose(res2.betas, ref.betas, atol=1e-10)


def test_checkpoint_partial_then_resume(tmp_path):
    ham = build_ham()
    v0 = lz.random_start_vector(ham.dim, 5, np.float64)
    ck = str(tmp_path / "lz2.npz")
    import lanczosplusplus_tpu.solver.lanczos as L
    # interrupt after two chunks by monkeypatching the chunk runner
    calls = {"n": 0}
    orig = L._lanczos_chunk_selective

    def limited(ham_, V, state, js):
        if calls["n"] >= 2:
            raise KeyboardInterrupt
        calls["n"] += 1
        return orig(ham_, V, state, js)

    L._lanczos_chunk_selective = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            L._lanczos_scan(ham, v0, 60, checkpoint=ck, chunk=10)
    finally:
        L._lanczos_chunk_selective = orig
    # resume completes and matches an uninterrupted run
    res = lz.tridiagonalize(ham, v0, 60, checkpoint=ck, chunk=10)
    ref = lz.tridiagonalize(ham, v0, 60)
    np.testing.assert_allclose(res.alphas, ref.alphas, atol=1e-10)
    np.testing.assert_allclose(res.betas, ref.betas, atol=1e-10)


def test_adaptive_convergence_extends_steps():
    """With a tiny initial step budget, lowest_states must extend until
    the Ritz residual converges."""
    ham = build_ham()
    evals, vecs = lz.lowest_states(ham, num_states=1, max_steps=12)
    dense_e = np.linalg.eigvalsh(ham.to_dense())[0]
    assert evals[0] == pytest.approx(dense_e, abs=1e-8)


def test_bf16_krylov_basis_accuracy():
    """bfloat16 V: ground energy still accurate to ~1e-3 relative."""
    import jax.numpy as jnp
    ham = build_ham(dtype=np.float32)
    v0 = lz.random_start_vector(ham.dim, 11, np.float32)
    import lanczosplusplus_tpu.solver.lanczos as L
    res32 = L.tridiagonalize(ham, v0, 80)
    res16 = L.tridiagonalize(ham, v0, 80, reorth_dtype=jnp.bfloat16)
    e32 = L.tridiag_eigh(res32.alphas, res32.betas)[0][0]
    e16 = L.tridiag_eigh(res16.alphas, res16.betas)[0][0]
    assert abs(e32 - e16) / abs(e32) < 2e-3


def test_selective_reorth_accuracy_and_sparsity():
    """Selective (omega-recurrence) reorthogonalization must match the
    full-reorth tridiagonal at oracle accuracy while paying the full-V
    Gram-Schmidt passes on only a small fraction of steps, and must
    keep the Krylov basis semiorthogonal."""
    ham = build_ham()
    v0 = lz.random_start_vector(ham.dim, 123, np.float64)
    V, a, b, nre = lz._lanczos_scan(ham, v0, 120, reorth="selective")
    dense = np.linalg.eigvalsh(ham.to_dense())[:4]
    es = lz.tridiag_eigh(np.asarray(a), np.asarray(b))[0][:4]
    np.testing.assert_allclose(es, dense, atol=1e-10)
    assert 0 < nre < 120 // 3, f"reorth on {nre}/120 steps"
    G = np.asarray(V) @ np.asarray(V).T
    assert np.abs(G - np.eye(120)).max() < 1e-10


def test_selective_reorth_checkpoint_resume(tmp_path):
    """Chunked + checkpointed selective run resumes to the same
    tridiagonal as an uninterrupted one (the omega-estimate state is
    part of the checkpoint)."""
    ham = build_ham()
    v0 = lz.random_start_vector(ham.dim, 9, np.float64)
    ref = lz.tridiagonalize(ham, v0, 60)
    ck = str(tmp_path / "sel.npz")
    import lanczosplusplus_tpu.solver.lanczos as L
    L._lanczos_scan(ham, v0, 60, checkpoint=ck, chunk=17)
    res = lz.tridiagonalize(ham, v0, 60, checkpoint=ck, chunk=17)
    np.testing.assert_allclose(res.alphas, ref.alphas, atol=1e-9)
    np.testing.assert_allclose(res.betas, ref.betas, atol=1e-9)


def test_excited_states_match_dense():
    """Excited= support: lowest 3 states vs dense eigh."""
    ham = build_ham()
    evals, vecs = lz.lowest_states(ham, num_states=3, max_steps=150)
    dense = np.linalg.eigvalsh(ham.to_dense())
    np.testing.assert_allclose(evals[:3], dense[:3], atol=1e-8)


def test_plain_two_pass_lanczos():
    """Memory-light plain Lanczos: E0 and ground vector via two-pass
    accumulation match the fully reorthogonalized solve."""
    ham = build_ham()
    e_ref, v_ref = lz.lowest_states(ham, max_steps=150)
    e_plain, v_plain = lz.lowest_states_plain(ham, max_steps=150)
    assert e_plain[0] == pytest.approx(e_ref[0], abs=1e-9)
    ov = abs(np.vdot(np.asarray(v_plain[0]), np.asarray(v_ref[0])))
    assert ov == pytest.approx(1.0, abs=1e-6)


def test_matvec_deterministic():
    """Determinism check (SURVEY section 5: deterministic-reduction
    tests): repeated applications produce bit-identical results."""
    import numpy as np
    import jax.numpy as jnp
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model

    inp = parse_input("""
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=HubbardOneBand
hubbardU 8 4 4 4 4 4 4 4 4
potentialV 16 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
TargetElectronsUp=4
TargetElectronsDown=4
SolverOptions=none
""")
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis(model.default_parts(inp))
    ham = model.hamiltonian(basis)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(ham.dim))
    y1 = np.asarray(ham.matvec(x))
    y2 = np.asarray(ham.matvec(x))
    assert np.array_equal(y1, y2)
