"""Lanczos tridiagonalization with full reorthogonalization.

TPU-native replacement for PsimagLite::LanczosSolver as the reference
uses it (reference: src/Engine/Engine.h:601-657 computeAllStatesBelow,
Engine.h:460-490 decomposition for spectral functions).

Design: one `lax.scan` over Lanczos steps; the Krylov basis V is a
dense (steps, dim) array carried through the scan, so full
reorthogonalization is two GEMVs against V — unfilled rows are zero and
contribute nothing, keeping shapes static.  The (alpha, beta)
tridiagonal is tiny and solved on host.  V rows are sharded the same
way as the state vector, so reorthogonalization runs as sharded
matmul + psum when the Hamiltonian is row-partitioned over a mesh.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp


@partial(jax.jit, donate_argnums=(1,))
def _lanczos_chunk(ham, V, v, js):
    """Run len(js) Lanczos steps continuing from (V, v); js are the
    global step indices written into V.

    V may be stored in a lower precision than v (e.g. bfloat16): the
    reorthogonalization GEMVs then read half the bytes — the dominant
    memory traffic of a Lanczos step — while alpha/beta and the state
    vector stay in the compute dtype.  Low-precision V degrades
    orthogonality to ~1e-3 and is only for throughput-oriented runs.
    """

    low_v = V.dtype != v.dtype

    def reorth_pass(V, w):
        if low_v:
            coeffs = jax.lax.dot_general(
                jnp.conj(V), w.astype(V.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=w.dtype)
            return w - jax.lax.dot_general(
                V, coeffs.astype(V.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=w.dtype)
        coeffs = jnp.conj(V) @ w
        return w - V.T @ coeffs

    def body(carry, j):
        V, v = carry
        V = V.at[j].set(v.astype(V.dtype))
        w = ham.matvec(v)
        alpha = jnp.real(jnp.vdot(v, w))
        # full reorthogonalization with the DGKS criterion: always one
        # pass; a second pass only when the first collapsed the norm
        # (eta = 1/sqrt(2)), which is when classical Gram-Schmidt loses
        # orthogonality (e.g. near Krylov-space exhaustion).  The
        # conditional saves the dominant V-read traffic on typical steps.
        norm0 = jnp.linalg.norm(w)
        w = reorth_pass(V, w)
        norm1 = jnp.linalg.norm(w)
        w = jax.lax.cond(norm1 < 0.7071 * norm0,
                         lambda ww: reorth_pass(V, ww),
                         lambda ww: ww, w)
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 0, beta, 1.0)
        v_next = jnp.where(beta > 0, w / safe, jnp.zeros_like(w))
        return (V, v_next), (alpha, beta)

    (V, v), (alphas, betas) = jax.lax.scan(body, (V, v), js)
    return V, v, alphas, betas


def _lanczos_scan(ham, v0, steps: int, checkpoint=None, chunk=None,
                  reorth_dtype=None):
    """Full run with optional chunked checkpointing: the Krylov basis,
    (alpha, beta) and the current vector are persisted to
    `checkpoint`.npz after each chunk and restored on restart — the
    resume capability the reference lacks (SURVEY.md section 5)."""
    dim = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((steps, dim), dtype=reorth_dtype or dtype)
    v = v0
    alphas = []
    betas = []
    start = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        data = np.load(checkpoint)
        if int(data["steps"]) == steps and int(data["dim"]) == dim:
            start = int(data["next_step"])
            V = jnp.asarray(data["V"])
            v = jnp.asarray(data["v"])
            alphas = list(data["alphas"])
            betas = list(data["betas"])
    chunk = chunk or (steps if checkpoint is None else max(steps // 8, 1))
    j = start
    while j < steps:
        n = min(chunk, steps - j)
        V, v, a, b = _lanczos_chunk(ham, V, v, jnp.arange(j, j + n))
        alphas.extend(np.asarray(a))
        betas.extend(np.asarray(b))
        j += n
        if checkpoint is not None:
            np.savez(checkpoint,
                     V=np.asarray(V), v=np.asarray(v),
                     alphas=np.asarray(alphas), betas=np.asarray(betas),
                     next_step=j, steps=steps, dim=dim)
    return V, jnp.asarray(np.asarray(alphas)), jnp.asarray(np.asarray(betas))


@jax.jit
def _lanczos_chunk_plain(ham, v, v_prev, beta_prev, js):
    """Memory-light three-term Lanczos (no stored Krylov basis, no
    reorthogonalization).  O(2 vectors) memory enables Hilbert
    dimensions far beyond what a stored (steps, dim) basis allows —
    the pod-scale configuration (BASELINE.json config 5).  Ghost
    eigenvalues appear as orthogonality decays; extremal eigenvalues
    converge regardless (standard plain-Lanczos behavior)."""

    def body(carry, j):
        v, v_prev, beta_prev = carry
        w = ham.matvec(v)
        alpha = jnp.real(jnp.vdot(v, w))
        w = w - alpha * v - beta_prev * v_prev
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 0, beta, 1.0)
        v_next = jnp.where(beta > 0, w / safe, jnp.zeros_like(w))
        return (v_next, v, beta), (alpha, beta)

    (v, v_prev, beta), (alphas, betas) = jax.lax.scan(
        body, (v, v_prev, beta_prev), js)
    return v, v_prev, beta, alphas, betas


@jax.jit
def _lanczos_accumulate_pass(ham, v, v_prev, beta_prev, weights, acc, js):
    """Second pass of two-pass Lanczos: replay the recurrence and
    accumulate sum_j weights[j] v_j into acc."""

    def body(carry, jw):
        v, v_prev, beta_prev, acc = carry
        j, wgt = jw
        acc = acc + wgt * v
        w = ham.matvec(v)
        alpha = jnp.real(jnp.vdot(v, w))
        w = w - alpha * v - beta_prev * v_prev
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 0, beta, 1.0)
        v_next = jnp.where(beta > 0, w / safe, jnp.zeros_like(w))
        return (v_next, v, beta, acc), None

    (v, v_prev, beta, acc), _ = jax.lax.scan(
        body, (v, v_prev, beta_prev, acc),
        (js, weights.astype(v.dtype)))
    return acc


def lowest_states_plain(ham, num_states: int = 1, seed: int = 7239443,
                        max_steps: int = 300):
    """Ground/low states via plain two-pass Lanczos: first pass builds
    (alpha, beta) with O(2 vectors) memory, host eigensolve, second
    pass replays the recurrence to accumulate the Ritz vectors."""
    dim = ham.dim
    dtype = ham.dtype
    steps = int(min(dim, max_steps))
    v0 = random_start_vector(dim, seed, dtype)
    zero = jnp.zeros_like(v0)
    v, vp, beta, alphas, betas = _lanczos_chunk_plain(
        ham, v0, zero, jnp.asarray(0.0, jnp.float64
                                   if dtype in (jnp.float64,
                                                jnp.complex128)
                                   else jnp.float32),
        jnp.arange(steps))
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    scale = max(np.abs(alphas).max(initial=0.0),
                np.abs(betas).max(initial=0.0), 1.0)
    m = steps
    for j in range(steps - 1):
        if betas[j] <= 1e-12 * scale:
            m = j + 1
            break
    evals, evecs = tridiag_eigh(alphas[:m], betas[:m])
    k = min(num_states, m)
    vecs = []
    for i in range(k):
        wts = np.zeros(steps)
        wts[:m] = evecs[:, i]
        acc = _lanczos_accumulate_pass(
            ham, v0, zero,
            jnp.asarray(0.0, jnp.float64
                        if dtype in (jnp.float64, jnp.complex128)
                        else jnp.float32),
            jnp.asarray(wts), jnp.zeros_like(v0), jnp.arange(steps))
        acc = acc / jnp.linalg.norm(acc)
        vecs.append(acc)
    return evals[:k], vecs


def tridiagonalize_plain(ham, v0, steps: int):
    """(alphas, betas) via the memory-light recurrence — enough for
    continued-fraction spectral functions, which never need the Krylov
    basis itself."""
    steps = int(min(steps, v0.shape[0]))
    rdt = jnp.float64 if v0.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    v, vp, beta, alphas, betas = _lanczos_chunk_plain(
        ham, v0, jnp.zeros_like(v0), jnp.asarray(0.0, rdt),
        jnp.arange(steps))
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    scale = max(np.abs(alphas).max(initial=0.0),
                np.abs(betas).max(initial=0.0), 1.0)
    m = steps
    for j in range(steps - 1):
        if betas[j] <= 1e-12 * scale:
            m = j + 1
            break
    return LanczosResult(alphas=alphas[:m], betas=betas[:m], V=None, m=m)


@dataclass
class LanczosResult:
    alphas: np.ndarray   # (m,)
    betas: np.ndarray    # (m,)  beta[j] couples step j to j+1
    V: jax.Array         # (steps, dim) Krylov basis (rows >= m are zero)
    m: int               # effective number of steps before breakdown


def tridiagonalize(ham, v0, steps: int, checkpoint=None,
                   chunk=None, reorth_dtype=None) -> LanczosResult:
    """Run `steps` Lanczos iterations from normalized v0 (optionally
    checkpointed/resumable; optionally with a low-precision Krylov
    basis, see _lanczos_scan)."""
    steps = int(min(steps, v0.shape[0]))
    V, alphas, betas = _lanczos_scan(ham, v0, steps, checkpoint=checkpoint,
                                     chunk=chunk,
                                     reorth_dtype=reorth_dtype)
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    # trim at breakdown (invariant subspace found)
    scale = max(np.abs(alphas).max(initial=0.0),
                np.abs(betas).max(initial=0.0), 1.0)
    tiny = 1e-12 * scale
    m = steps
    for j in range(steps - 1):
        if betas[j] <= tiny:
            m = j + 1
            break
    return LanczosResult(alphas=alphas[:m], betas=betas[:m], V=V, m=m)


def tridiag_eigh(alphas: np.ndarray, betas: np.ndarray):
    """Host eigensolve of the Lanczos tridiagonal (replaces LAPACK via
    PsimagLite ground-state extraction)."""
    if len(alphas) == 1:
        return alphas.copy(), np.ones((1, 1))
    return scipy.linalg.eigh_tridiagonal(alphas, betas[:len(alphas) - 1])


def ritz_vectors(res: LanczosResult, weights: np.ndarray) -> jax.Array:
    """Columns of weights (m, k) combined over the Krylov basis."""
    w = jnp.asarray(
        np.vstack([weights, np.zeros((res.V.shape[0] - res.m,
                                      weights.shape[1]))]),
        dtype=res.V.dtype)
    return (res.V.T @ w).T  # (k, dim)


def random_start_vector(dim: int, seed: int, dtype) -> jax.Array:
    """Deterministic random start (reference: Engine.h:620-621 uses
    PsimagLite::Random48 fillRandom)."""
    key = jax.random.PRNGKey(seed)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        real_dt = jnp.float64 if jnp.dtype(dtype) == jnp.complex128 \
            else jnp.float32
        k1, k2 = jax.random.split(key)
        v = (jax.random.normal(k1, (dim,), real_dt) +
             1j * jax.random.normal(k2, (dim,), real_dt)).astype(dtype)
    else:
        v = jax.random.normal(key, (dim,), dtype)
    return v / jnp.linalg.norm(v)


def lowest_states(ham, num_states: int = 1, seed: int = 7239443,
                  max_steps: int = 200, tol: float = 1e-10,
                  krylov_budget_bytes: int = 6 << 30):
    """Lowest `num_states` eigenpairs of a sector Hamiltonian.

    Equivalent to LanczosSolver::computeAllStatesBelow as driven by
    Engine::computeAllStatesBelow (reference: Engine.h:616-626), with
    the dense-diagonalization fallback folded in for tiny sectors
    (reference: Engine.h:627-639).  When the stored Krylov basis would
    exceed `krylov_budget_bytes`, the memory-light plain two-pass
    solver takes over automatically (huge sectors).
    """
    dim = ham.dim
    dtype = ham.dtype
    if dim <= max(64, num_states + 2):
        dense = ham.to_dense()
        evals, evecs = np.linalg.eigh(dense)
        k = min(num_states, dim)
        return evals[:k], jnp.asarray(evecs[:, :k].T.copy())
    itemsize = np.dtype(dtype).itemsize
    if min(dim, max_steps) * dim * itemsize > krylov_budget_bytes:
        return lowest_states_plain(ham, num_states=num_states, seed=seed,
                                   max_steps=max_steps)

    v0 = random_start_vector(dim, seed, dtype)
    steps = int(min(dim, max_steps))
    if jnp.dtype(dtype) in (jnp.float32, jnp.complex64):
        tol = max(tol, 1e-6)
    while True:
        res = tridiagonalize(ham, v0, steps)
        evals, evecs = tridiag_eigh(res.alphas, res.betas)
        # a-posteriori Ritz residual estimate: |beta_m * u[last]|
        # (standard Lanczos bound) for the requested states
        k_chk = min(num_states, res.m)
        resid = abs(res.betas[res.m - 1]) * \
            np.abs(evecs[res.m - 1, :k_chk]).max()
        scale = max(np.abs(evals[0]), 1.0)
        if (res.m < steps or steps >= dim or
                resid <= tol * scale or steps >= 4 * max_steps):
            break
        steps = int(min(dim, steps * 2))  # not converged: extend
    k = min(num_states, res.m)
    vecs = ritz_vectors(res, evecs[:, :k])
    # normalize (Ritz vectors are orthonormal up to reorth tolerance)
    norms = jnp.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs / norms
    return evals[:k], vecs
