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


def test_plan_build_vectorized_speed_and_equivalence():
    """Whole-array plan construction: a 1.2e7-entry operator map builds
    in seconds (the round-2 per-nonzero Python loop took minutes), and
    small plans bit-match a straightforward reference construction."""
    import time

    rng = np.random.default_rng(7)
    # equivalence against a brute-force bucketer on a small map
    src_dim, dst_dim, ndev = 3000, 2200, 8
    tgt = rng.integers(-1, dst_dim, size=src_dim)
    amp = rng.standard_normal(src_dim)
    amp[tgt < 0] = 0.0
    plan = SectorScatterPlan(tgt, amp, src_dim, dst_dim, ndev)
    s_src, s_dst = plan.s_src, plan.s_dst
    buckets = [[([], [], []) for _ in range(ndev)] for _ in range(ndev)]
    for i in np.nonzero(tgt >= 0)[0]:
        d, o = i // s_src, tgt[i] // s_dst
        buckets[d][o][0].append(i - d * s_src)
        buckets[d][o][1].append(tgt[i] - o * s_dst)
        buckets[d][o][2].append(amp[i])
    for d in range(ndev):
        for o in range(ndev):
            n = len(buckets[d][o][0])
            np.testing.assert_array_equal(plan.send_src[d, o, :n],
                                          buckets[d][o][0])
            np.testing.assert_array_equal(plan.dst_idx[o, d, :n],
                                          buckets[d][o][1])
            np.testing.assert_allclose(plan.send_amp[d, o, :n],
                                       buckets[d][o][2])
            assert not plan.send_amp[d, o, n:].any()

    # speed at north-star scale
    big = 12_000_000
    tgt_b = rng.integers(-1, big, size=big)
    amp_b = np.ones(big)
    t0 = time.perf_counter()
    SectorScatterPlan(tgt_b, amp_b, big, big, 8)
    assert time.perf_counter() - t0 < 5.0
