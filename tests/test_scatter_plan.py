"""Distributed sector-changing operator apply vs the host scatter."""

import numpy as np
import jax

from lanczosplusplus_tpu.parallel.mesh import make_mesh
from lanczosplusplus_tpu.parallel.scatter_plan import (
    SectorScatterPlan, distributed_apply_operator_map)
from lanczosplusplus_tpu.engine.engine import apply_operator_map


def test_random_map_matches_host():
    rng = np.random.default_rng(11)
    src_dim, dst_dim = 1000, 700
    tgt = rng.integers(-1, dst_dim, size=src_dim)   # -1 = forbidden
    amp = rng.standard_normal(src_dim)
    amp[tgt < 0] = 0.0
    x = rng.standard_normal(src_dim)
    mesh = make_mesh(jax.devices()[:8])
    got = distributed_apply_operator_map(tgt, amp, dst_dim, x, mesh,
                                         factor=0.5)
    want = apply_operator_map(tgt, amp, dst_dim, x, factor=0.5)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_engine_operator_map_distributed():
    """A real c-operator sector map (N -> N-1) applied distributed."""
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine
    from lanczosplusplus_tpu.engine.operators import LabeledOperator

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
    eng = Engine(model, inp)
    op = LabeledOperator("c")
    new_parts = model.has_new_parts(eng.parts, op, 0, 0)
    dst_basis = model.create_basis(new_parts)
    tgt, amp, dst_dim = model.operator_map(op, 2, 0, 0, eng.basis,
                                           dst_basis)
    x = np.asarray(eng.eigenvector(0))
    mesh = make_mesh(jax.devices()[:8])
    got = distributed_apply_operator_map(tgt, amp, dst_dim, x, mesh)
    want = apply_operator_map(tgt, amp, dst_dim, x)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-10)
