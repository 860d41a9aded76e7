"""Distributed sector-changing operator application.

c|gs>-style operators map between two differently sharded index spaces
(SURVEY.md §7 hard parts: "precomputed permutation/alltoall plans").
`SectorScatterPlan` precomputes, host-side, from the operator's
(tgt, amp) index map (model.operator_map — the vectorized
accModifiedState_, reference: Engine.h:416-458):

- per (src device -> dst device) bucket: local source gather indices and
  amplitudes, padded to the global max bucket size so `lax.all_to_all`
  has a static shape (padding has amp 0, so it contributes nothing);
- per (dst device <- src device) local destination scatter indices.

The shard_map body is: local gather+multiply, ONE all-to-all of the
contribution values, local scatter-add — no replication of either
sector's vector.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lanczosplusplus_tpu.parallel.mesh import ROWS


def _pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


class SectorScatterPlan:
    """z[tgt[i]] += factor * amp[i] * x[i] across a row-sharded mesh."""

    def __init__(self, tgt, amp, src_dim: int, dst_dim: int, ndev: int):
        tgt = np.asarray(tgt)
        amp = np.asarray(amp)
        self.src_dim = src_dim
        self.dst_dim = dst_dim
        self.src_pad = _pad_to(src_dim, ndev)
        self.dst_pad = _pad_to(dst_dim, ndev)
        self.ndev = ndev
        s_src = self.src_pad // ndev
        s_dst = self.dst_pad // ndev
        self.s_src, self.s_dst = s_src, s_dst

        buckets = [[([], [], []) for _ in range(ndev)]
                   for _ in range(ndev)]
        valid = np.nonzero(tgt >= 0)[0]
        d_of = valid // s_src
        o_of = tgt[valid] // s_dst
        for i, d, o in zip(valid, d_of, o_of):
            src_l, dst_l, amp_l = buckets[d][o]
            src_l.append(i - d * s_src)
            dst_l.append(tgt[i] - o * s_dst)
            amp_l.append(amp[i])
        maxcount = max((len(b[0]) for row in buckets for b in row),
                       default=1)
        maxcount = max(maxcount, 1)
        send_src = np.zeros((ndev, ndev, maxcount), np.int32)
        send_amp = np.zeros((ndev, ndev, maxcount), amp.dtype)
        dst_idx = np.zeros((ndev, ndev, maxcount), np.int32)
        for d in range(ndev):
            for o in range(ndev):
                src_l, dst_l, amp_l = buckets[d][o]
                n = len(src_l)
                send_src[d, o, :n] = src_l
                send_amp[d, o, :n] = amp_l
                dst_idx[o, d, :n] = dst_l   # receiver-major layout
        self.send_src = send_src
        self.send_amp = send_amp
        self.dst_idx = dst_idx
        self.maxcount = maxcount

    def device_arrays(self, mesh: Mesh):
        first = NamedSharding(mesh, P(ROWS, None, None))
        return (jax.device_put(jnp.asarray(self.send_src), first),
                jax.device_put(jnp.asarray(self.send_amp), first),
                jax.device_put(jnp.asarray(self.dst_idx), first))

    def apply(self, mesh: Mesh, x, factor=1.0, out_dtype=None):
        """x: (src_pad,) vector sharded P(ROWS) (or host array).
        Returns the (dst_pad,) result sharded P(ROWS)."""
        send_src, send_amp, dst_idx = self.device_arrays(mesh)
        out_dtype = out_dtype or np.result_type(
            np.asarray(x).dtype, send_amp.dtype,
            np.asarray(factor).dtype)
        s_dst = self.s_dst

        def body(ss, sa, di, xv):
            vals = (sa[0] * xv[ss[0]]).astype(out_dtype)
            recv = jax.lax.all_to_all(vals, ROWS, 0, 0)
            z = jnp.zeros((s_dst,), out_dtype).at[di[0]].add(recv)
            return z * jnp.asarray(factor, out_dtype)

        spec3 = P(ROWS, None, None)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(spec3, spec3, spec3, P(ROWS)),
                       out_specs=P(ROWS))
        xs = jnp.asarray(x)
        if xs.shape[0] < self.src_pad:
            xs = jnp.concatenate(
                [xs, jnp.zeros(self.src_pad - xs.shape[0], xs.dtype)])
        xs = jax.device_put(xs, NamedSharding(mesh, P(ROWS)))
        return jax.jit(fn)(send_src, send_amp, dst_idx, xs)


def distributed_apply_operator_map(tgt, amp, dst_dim, x, mesh: Mesh,
                                   factor=1.0):
    """Drop-in distributed variant of engine.apply_operator_map:
    returns the unpadded (dst_dim,) host array."""
    plan = SectorScatterPlan(tgt, amp, len(np.asarray(tgt)), dst_dim,
                             mesh.devices.size)
    out = plan.apply(mesh, x, factor=factor)
    return np.asarray(out)[:dst_dim]
