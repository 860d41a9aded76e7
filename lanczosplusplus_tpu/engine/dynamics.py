"""Momentum-resolved dynamics drivers.

1. `dynamics1_spectral` — continued fraction of
   |phi> = sum_site e^{i k site} (c^dag_{a,up} c_{b,up})_site |gs>
   (reference: src/dynamics1.cpp:22-98; note the reference applies a
   site-independent phase factor 2 pi m / L (dynamics1.cpp:43-44),
   which collapses to a global phase — here the phase is e^{i k site},
   the k-resolved operator its own dynamicsFt.pl pipeline expects).

2. `quasiparticle_weight_z` — Z(k) = |<gs_{N-1}| c_k |gs_N>|^2 with
   c_k = sum_site e^{2 pi i k site / L} c_site (reference:
   src/quasiparticleWeightZ.cpp:33-67, 139-204; instead of rewriting
   the input text to reach the (nup-1, ndown) sector we just construct
   the second engine directly).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lanczosplusplus_tpu.engine.operators import LabeledOperator
from lanczosplusplus_tpu.engine.engine import apply_operator_map
from lanczosplusplus_tpu.engine.spectral import ContinuedFraction
from lanczosplusplus_tpu.solver import lanczos as lz


def dynamics1_spectral(engine, m_for_k: int, orbs=(0, 1),
                       max_steps: int = 200) -> ContinuedFraction:
    model = engine.model
    n = model.geometry.number_of_sites()
    gs = np.asarray(engine.eigenvector(0))
    phi = np.zeros(engine.basis.size, dtype=np.complex128)
    op = LabeledOperator("cdagger_a_up_c_b_up")
    for site in range(n):
        arg = 2.0 * np.pi * m_for_k * site / n
        factor = np.cos(arg) + 1j * np.sin(arg)
        tgt, amp, dst = model.operator_map(op, site, 0, orbs,
                                           engine.basis, engine.basis)
        phi += apply_operator_map(tgt, amp, dst, gs, factor)
    weight = float(np.real(np.vdot(phi, phi)))
    if weight < 1e-20:
        return ContinuedFraction(np.zeros(0), np.zeros(0),
                                 engine.ground_energy, 0.0, 1)
    ham = model.hamiltonian(engine.basis,
                            dtype=np.complex128)
    v0 = jnp.asarray(phi / np.sqrt(weight))
    res = lz.tridiagonalize(ham, v0, max_steps)
    # bosonic, diagonal, type 0 (reference dynamics1.cpp:92-96)
    return ContinuedFraction(alphas=res.alphas, betas=res.betas,
                             e0=engine.ground_energy, weight=weight,
                             sigma=1, meta=f"k={m_for_k}")


def quasiparticle_weight_z(engine, spin: int = 0, ratio: bool = False):
    """Z(k) for all momenta; returns list of (k_index, value)."""
    from lanczosplusplus_tpu.engine.engine import Engine

    model = engine.model
    n = model.geometry.number_of_sites()
    op_c = LabeledOperator("c")
    new_parts = model.has_new_parts(engine.parts, op_c, spin, 0)
    if new_parts is None:
        return []
    basis2 = model.create_basis(new_parts)
    ham2 = model.hamiltonian(basis2)
    evals2, vecs2 = lz.lowest_states(ham2, num_states=1,
                                     seed=engine.config.seed,
                                     max_steps=engine.config.lanczos_steps)
    gs2 = np.asarray(vecs2[0])
    gs1 = np.asarray(engine.eigenvector(0))

    out = []
    # per-site maps computed once
    site_maps = [model.operator_map(op_c, site, spin, 0, engine.basis,
                                    basis2) for site in range(n)]
    for k in range(n):
        phi = np.zeros(basis2.size, dtype=np.complex128)
        for site in range(n):
            arg = 2.0 * np.pi * k * site / n
            factor = np.cos(arg) + 1j * np.sin(arg)
            tgt, amp, dst = site_maps[site]
            phi += apply_operator_map(tgt, amp, dst, gs1, factor)
        norm2 = float(np.real(np.vdot(phi, phi)))
        overlap = np.vdot(gs2, phi)
        z = float(np.abs(overlap) ** 2)
        if ratio and norm2 > 1e-20:
            z /= norm2
        out.append((k, z))
    return out
