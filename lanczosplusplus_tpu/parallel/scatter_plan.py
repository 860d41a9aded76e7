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

        # native single-pass bucketing when available (the host memcpy
        # rate bounds plan construction; one C pass beats any number of
        # numpy passes at 1e7-dim operator maps)
        from lanczosplusplus_tpu import native
        tables = native.scatter_plan_tables(tgt, amp, s_src, s_dst, ndev)
        if tables is not None:
            (self.send_src, self.send_amp, self.dst_idx,
             self.maxcount) = tables
            return

        # numpy fallback: whole-array bucketing (bincount + prefix-sum
        # position arithmetic, the HaloPlan pattern) — the per-nonzero
        # Python loop this replaces cost minutes at 1e7-dim maps
        valid = np.nonzero(tgt >= 0)[0]
        t_v = tgt[valid].astype(np.int64)
        d_of = (valid // s_src).astype(np.int64)
        o_of = t_v // s_dst
        key = d_of * ndev + o_of
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        counts = np.bincount(key_s, minlength=ndev * ndev)
        maxcount = max(int(counts.max(initial=0)), 1)
        offsets = np.zeros(ndev * ndev + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        pos = np.arange(key_s.shape[0], dtype=np.int64) - offsets[key_s]
        d_s = key_s // ndev
        o_s = key_s % ndev
        send_src = np.zeros((ndev, ndev, maxcount), np.int32)
        send_amp = np.zeros((ndev, ndev, maxcount), amp.dtype)
        dst_idx = np.zeros((ndev, ndev, maxcount), np.int32)
        send_src[d_s, o_s, pos] = valid[order] - d_s * s_src
        send_amp[d_s, o_s, pos] = amp[valid][order]
        dst_idx[o_s, d_s, pos] = t_v[order] - o_s * s_dst  # receiver-major
        self.send_src = send_src
        self.send_amp = send_amp
        self.dst_idx = dst_idx
        self.maxcount = maxcount

    def device_arrays(self, mesh: Mesh):
        first = NamedSharding(mesh, P(ROWS, None, None))
        # canonicalize the amp dtype so host-f64 maps do not leak
        # float64 requests into non-x64 shard_map bodies
        amp = jnp.asarray(
            self.send_amp.astype(jax.dtypes.canonicalize_dtype(
                self.send_amp.dtype)))
        return (jax.device_put(jnp.asarray(self.send_src), first),
                jax.device_put(amp, first),
                jax.device_put(jnp.asarray(self.dst_idx), first))

    def apply(self, mesh: Mesh, x, factor=1.0, out_dtype=None):
        """x: (src_pad,) vector sharded P(ROWS) (or host array).
        Returns the (dst_pad,) result sharded P(ROWS)."""
        send_src, send_amp, dst_idx = self.device_arrays(mesh)
        out_dtype = out_dtype or jax.dtypes.canonicalize_dtype(
            np.result_type(np.asarray(x).dtype, send_amp.dtype,
                           np.asarray(factor).dtype))
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
