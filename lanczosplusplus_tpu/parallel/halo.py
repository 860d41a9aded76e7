"""Halo-exchange distributed SpMV.

The naive row-sharded matvec lets XLA all-gather the full state vector
(O(dim) communication per device).  ED Hamiltonians touch only a
bounded set of off-shard columns per row, so the communication can be
the *halo*: for each (owner, consumer) device pair, the unique state
entries the consumer's rows read from the owner's shard
(SURVEY.md §7 item 8: "all-gather/all-to-all of vector halo segments
... overlapped with local SpMV").

`HaloPlan` precomputes, host-side, from the ELL column structure:
- per-device send index lists (what I ship to each peer), padded to the
  global max so `lax.all_to_all` has a static shape;
- remapped ELL columns into the concatenated
  [local shard | halo buffer] index space.

`halo_matvec` is a `shard_map` whose only collective is one
all-to-all of the halo values; the local gather has no dependence on
the exchange, so XLA overlaps it with the transfer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lanczosplusplus_tpu.parallel.mesh import ROWS


class HaloPlan:
    def __init__(self, ham, ndev: int):
        h = ham.padded(ndev)
        dim = h.dim
        shard = dim // ndev
        cols = np.asarray(h.ell.cols)
        vals = np.asarray(h.ell.vals)
        k = cols.shape[1]
        owner = cols // shard

        send_lists = [[np.zeros(0, np.int64) for _ in range(ndev)]
                      for _ in range(ndev)]
        new_cols = np.zeros_like(cols)
        # per consumer device: unique remote columns per owner
        halo_sizes = np.zeros((ndev, ndev), dtype=np.int64)
        remote_maps = {}
        for d in range(ndev):
            rows = slice(d * shard, (d + 1) * shard)
            c = cols[rows]
            own = owner[rows]
            for s in range(ndev):
                if s == d:
                    continue
                mask = own == s
                uniq = np.unique(c[mask])
                send_lists[s][d] = uniq - s * shard
                halo_sizes[d, s] = uniq.shape[0]
                remote_maps[(d, s)] = {int(x): i
                                       for i, x in enumerate(uniq)}
        maxcount = max(int(halo_sizes.max()), 1)
        # halo buffer layout per consumer: ndev slots of maxcount each
        # (slot s holds what owner s sent; own slot unused)
        for d in range(ndev):
            rows = slice(d * shard, (d + 1) * shard)
            c = cols[rows]
            own = owner[rows]
            nc = np.empty_like(c)
            local = own == d
            nc[local] = c[local] - d * shard
            for s in range(ndev):
                if s == d:
                    continue
                mask = own == s
                if not mask.any():
                    continue
                m = remote_maps[(d, s)]
                flat = c[mask]
                nc[mask] = shard + s * maxcount + \
                    np.array([m[int(x)] for x in flat], dtype=np.int64)
            new_cols[rows] = nc
        send_idx = np.zeros((ndev, ndev, maxcount), dtype=np.int32)
        for s in range(ndev):
            for d in range(ndev):
                lst = send_lists[s][d]
                send_idx[s, d, :len(lst)] = lst
        self.ndev = ndev
        self.shard = shard
        self.maxcount = maxcount
        self.dim = dim
        self.orig_dim = ham.dim
        self.new_cols = new_cols.astype(np.int32)
        self.vals = vals
        self.diag = np.asarray(h.diag)
        self.send_idx = send_idx
        # communication volume relative to an all-gather of x
        # (which moves dim * (ndev - 1) values in total)
        self.halo_fraction = float(halo_sizes.sum()) / \
            max(dim * (ndev - 1), 1)

    def device_arrays(self, mesh: Mesh):
        row = NamedSharding(mesh, P(ROWS, None))
        vec = NamedSharding(mesh, P(ROWS))
        first = NamedSharding(mesh, P(ROWS, None, None))
        return dict(
            diag=jax.device_put(jnp.asarray(self.diag), vec),
            cols=jax.device_put(jnp.asarray(self.new_cols), row),
            vals=jax.device_put(jnp.asarray(self.vals), row),
            send_idx=jax.device_put(jnp.asarray(self.send_idx), first),
        )

    def hamiltonian(self, mesh: Mesh) -> "HaloHamiltonian":
        arrays = self.device_arrays(mesh)
        return HaloHamiltonian(diag=arrays["diag"], cols=arrays["cols"],
                               vals=arrays["vals"],
                               send_idx=arrays["send_idx"], mesh=mesh)

    def matvec_fn(self, mesh: Mesh):
        def halo_matvec(diag, cols, vals, send_idx, x):
            # shard-local shapes: diag/x (shard,), cols/vals (shard, K),
            # send_idx (1, ndev, maxcount)
            send = x[send_idx[0]]                      # (ndev, maxcount)
            recv = jax.lax.all_to_all(send, ROWS, 0, 0)
            halo = recv.reshape(-1)                    # ndev*maxcount
            combined = jnp.concatenate([x, halo])
            return diag * x + jnp.sum(vals * combined[cols], axis=-1)

        spec_row = P(ROWS, None)
        fn = shard_map(halo_matvec, mesh=mesh,
                       in_specs=(P(ROWS), spec_row, spec_row,
                                 P(ROWS, None, None), P(ROWS)),
                       out_specs=P(ROWS))
        return jax.jit(fn)


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloHamiltonian:
    """Hamiltonian whose matvec is the halo-exchange shard_map; drops
    into the same Lanczos scan as the single-chip Hamiltonian."""
    diag: jax.Array
    cols: jax.Array
    vals: jax.Array
    send_idx: jax.Array
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))

    @property
    def dim(self):
        return self.diag.shape[0]

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x):
        def halo_matvec(diag, cols, vals, send_idx, x):
            send = x[send_idx[0]]
            recv = jax.lax.all_to_all(send, ROWS, 0, 0)
            combined = jnp.concatenate([x, recv.reshape(-1)])
            return diag * x + jnp.sum(vals * combined[cols], axis=-1)

        spec_row = P(ROWS, None)
        fn = shard_map(halo_matvec, mesh=self.mesh,
                       in_specs=(P(ROWS), spec_row, spec_row,
                                 P(ROWS, None, None), P(ROWS)),
                       out_specs=P(ROWS))
        return fn(self.diag, self.cols, self.vals, self.send_idx, x)


def halo_lowest_states(ham, mesh: Mesh, num_states: int = 1,
                       seed: int = 7239443, max_steps: int = 200):
    """Distributed lowest_states with halo-exchange communication
    instead of a full all-gather."""
    from lanczosplusplus_tpu.parallel.mesh import sharded_selective_solve

    plan = HaloPlan(ham, mesh.devices.size)
    sham = plan.hamiltonian(mesh)
    return sharded_selective_solve(sham, mesh, plan.orig_dim,
                                   num_states, seed, max_steps)
