"""Block-factorized Heisenberg solver: half-chain Kronecker structure.

The flat sector basis (one word per state + ELL) stores O(dim * bonds)
indices.  Splitting the lattice into left/right halves L, R decomposes
the Sz sector as a direct sum over the left magnetization a:

    H = sum_a [ H_L(a) (x) I + I (x) H_R(M-a) ]  (within-block, dense
                                                   half matrices on MXU)
      + cross bonds (i in L, j in R):
          Jzz sz_i (x) sz_j                       (row/col scaling)
          (Jpm/2) (S+_i (x) S-_j + h.c.)          (small transfer
                                                   matrices -> MXU)

Each block's state is a (dimL_a, dimR_{M-a}) matrix; half bases are
exponentially smaller than the sector (C(n/2, *) vs C(n, M)), so the
dense half-Hamiltonians and transfer operators all fit trivially while
every hot op is a matmul.  This is the spin-model analogue of the
Hubbard dense-factor path and scales chains well past what the flat ELL
can hold.

Validated against the flat HeisenbergModel path (same physics, block
ordering differs).  S = 1/2 (the standard large-chain case).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lanczosplusplus_tpu.core import bits
from lanczosplusplus_tpu.core.combinatorics import enumerate_combinations


def _half_dense_h(words, jpm, jzz, offset, nsites_half):
    """Dense Hamiltonian of one half (internal bonds only), S=1/2;
    site i of the half corresponds to global site offset + i."""
    dim = len(words)
    occ = bits.bits_to_table(words, nsites_half).astype(np.float64)
    m = occ - 0.5
    sub_zz = jzz[offset:offset + nsites_half,
                 offset:offset + nsites_half]
    diag = 0.5 * np.einsum("si,ij,sj->s", m, sub_zz, m)
    h = np.diag(diag)
    order = {int(w): k for k, w in enumerate(words)}
    for i in range(nsites_half):
        for j in range(nsites_half):
            if i == j:
                continue
            jv = jpm[offset + i, offset + j]
            if jv == 0:
                continue
            for k, w in enumerate(words):
                wi = (int(w) >> i) & 1
                wj = (int(w) >> j) & 1
                if wi == 0 and wj == 1:
                    tgt = order[int(w) ^ (1 << i) ^ (1 << j)]
                    h[k, tgt] += 0.5 * jv
    return h


def _transfer(words_src, words_dst, site, raise_):
    """S+ (raise_) or S- at `site` within a half: dense transfer matrix
    (dst x src), S=1/2 amplitudes are 1."""
    order = {int(w): k for k, w in enumerate(words_dst)}
    t = np.zeros((len(words_dst), len(words_src)))
    for k, w in enumerate(words_src):
        occ = (int(w) >> site) & 1
        if raise_ and occ == 0:
            t[order[int(w) | (1 << site)], k] = 1.0
        elif not raise_ and occ == 1:
            t[order[int(w) ^ (1 << site)], k] = 1.0
    return t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeisenbergBlockHamiltonian:
    """Direct-sum-of-blocks Hamiltonian; state vector = concatenation of
    flattened (dimL_a, dimR_a) blocks."""
    h_left: Tuple[jax.Array, ...]    # per block (dimL, dimL)
    h_right: Tuple[jax.Array, ...]   # per block (dimR, dimR)
    sz_left: Tuple[jax.Array, ...]   # per (block, cross-bond) row scales
    sz_right: Tuple[jax.Array, ...]
    up_left: Tuple[jax.Array, ...]   # per (block, bond): S+_i L transfer
    dn_right: Tuple[jax.Array, ...]  # paired S-_j R transfer
    shapes: tuple = dataclasses.field(metadata=dict(static=True))
    nbonds: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dim(self):
        return sum(a * b for (a, b) in self.shapes)

    @property
    def dtype(self):
        return self.h_left[0].dtype

    def _split(self, x):
        out = []
        off = 0
        for (a, b) in self.shapes:
            out.append(x[off:off + a * b].reshape(a, b))
            off += a * b
        return out

    def matvec(self, x):
        xs = self._split(x)
        nblk = len(self.shapes)
        ys = [jnp.zeros_like(xb) for xb in xs]
        for k in range(nblk):
            ys[k] = ys[k] + self.h_left[k] @ xs[k] + \
                xs[k] @ self.h_right[k].T
            for b in range(self.nbonds):
                idx = k * self.nbonds + b
                # Jzz cross: sz_i scaling on rows x sz_j on cols
                ys[k] = ys[k] + (self.sz_left[idx][:, None] * xs[k] *
                                 self.sz_right[idx][None, :])
                # S+_i(L) S-_j(R): block k -> k+1 with amplitude 1/2 Jpm
                if k + 1 < nblk:
                    up = self.up_left[idx]       # (dimL_{k+1}, dimL_k)
                    dn = self.dn_right[idx]      # (dimR_{k+1}, dimR_k)
                    contrib = up @ xs[k] @ dn.T
                    ys[k + 1] = ys[k + 1] + contrib
                    # hermitian partner: (k+1) -> k
                    ys[k] = ys[k] + up.T @ xs[k + 1] @ dn
        return jnp.concatenate([yb.reshape(-1) for yb in ys])

    def to_dense(self):
        eye = np.eye(self.dim)
        cols = [np.asarray(self.matvec(jnp.asarray(eye[:, c])))
                for c in range(self.dim)]
        return np.stack(cols, axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatFactoredHamiltonian:
    """Permutation wrapper: applies the block-factorized matvec to
    vectors in the sorted-word HeisenbergBasis order (two gathers around
    the MXU matmuls), so solvers and operator maps see flat order."""
    inner: HeisenbergBlockHamiltonian
    perm: jax.Array   # block position p -> flat index perm[p]
    inv: jax.Array    # flat index f -> block position inv[f]

    @property
    def dim(self):
        return self.inner.dim

    @property
    def dtype(self):
        return self.inner.dtype

    def matvec(self, x):
        return self.inner.matvec(x[self.perm])[self.inv]

    def to_dense(self):
        eye = np.eye(self.dim)
        cols = [np.asarray(self.matvec(jnp.asarray(eye[:, c])))
                for c in range(self.dim)]
        return np.stack(cols, axis=1)


class FactoredHeisenbergChain:
    """Builder for S=1/2 chains: split at nsite//2."""

    def __init__(self, model, nsite: int, szpc: int, dtype=np.float64):
        if model.twice_s != 1:
            raise NotImplementedError("factored path: S=1/2 only")
        n_l = nsite // 2
        n_r = nsite - n_l
        self.n_l, self.n_r = n_l, n_r
        jpm, jzz = model.jpm, model.jzz
        cross = [(i, j) for i in range(n_l)
                 for j in range(n_l, nsite)
                 if jpm[i, j] != 0 or jzz[i, j] != 0]
        self.cross = cross
        amin = max(0, szpc - n_r)
        amax = min(n_l, szpc)
        left_words = {a: enumerate_combinations(n_l, a)
                      for a in range(amin, amax + 2)
                      if a <= n_l}
        right_words = {b: enumerate_combinations(n_r, b)
                       for b in range(max(szpc - amax - 1, 0),
                                      szpc - amin + 1)
                       if 0 <= b <= n_r}
        blocks = list(range(amin, amax + 1))
        self.blocks = blocks
        shapes = []
        h_left, h_right = [], []
        sz_l, sz_r, up_l, dn_r = [], [], [], []
        for a in blocks:
            lw = left_words[a]
            rw = right_words[szpc - a]
            shapes.append((len(lw), len(rw)))
            h_left.append(jnp.asarray(_half_dense_h(
                lw, jpm, jzz, 0, n_l).astype(dtype)))
            h_right.append(jnp.asarray(_half_dense_h(
                rw, jpm, jzz, n_l, n_r).astype(dtype)))
            occ_l = bits.bits_to_table(lw, n_l).astype(np.float64)
            occ_r = bits.bits_to_table(rw, n_r).astype(np.float64)
            for (i, j) in cross:
                jz = jzz[i, j]
                sz_l.append(jnp.asarray(
                    (jz * (occ_l[:, i] - 0.5)).astype(dtype)))
                sz_r.append(jnp.asarray(
                    (occ_r[:, j - n_l] - 0.5).astype(dtype)))
                # S+_i(L): a -> a+1 ; S-_j(R): (szpc-a) -> (szpc-a-1)
                if a + 1 in left_words and (szpc - a - 1) in right_words \
                        and a + 1 <= amax + 0 + 1 and a < amax + 1:
                    up = _transfer(lw, left_words[a + 1], i, True)
                    dn = _transfer(rw, right_words[szpc - a - 1],
                                   j - n_l, False)
                    amp = 0.5 * jpm[i, j]
                    up_l.append(jnp.asarray((amp * up).astype(dtype)))
                    dn_r.append(jnp.asarray(dn.astype(dtype)))
                else:
                    up_l.append(jnp.zeros((1, len(lw)), dtype=dtype))
                    dn_r.append(jnp.zeros((1, len(rw)), dtype=dtype))
        # fix ragged top-block transfers: the last block has no a+1
        # destination; replace with zero maps of matching next shapes
        self.ham = HeisenbergBlockHamiltonian(
            h_left=tuple(h_left), h_right=tuple(h_right),
            sz_left=tuple(sz_l), sz_right=tuple(sz_r),
            up_left=tuple(up_l), dn_right=tuple(dn_r),
            shapes=tuple(shapes), nbonds=len(cross))
        self.left_words = left_words
        self.right_words = right_words
        self.szpc = szpc

    def flat_perm(self, basis) -> np.ndarray:
        """perm[p] = flat (sorted-word) index of block position p."""
        perm = np.empty(self.ham.dim, dtype=np.int64)
        off = 0
        for a, (dl, dr) in zip(self.blocks, self.ham.shapes):
            lw = self.left_words[a]
            rw = self.right_words[self.szpc - a]
            words = (rw.astype(np.uint64)[None, :] << np.uint64(self.n_l)) \
                | lw.astype(np.uint64)[:, None]
            perm[off:off + dl * dr] = basis.rank(words.reshape(-1))
            off += dl * dr
        return perm

    def flat_ham(self, basis) -> FlatFactoredHamiltonian:
        perm = self.flat_perm(basis)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0])
        return FlatFactoredHamiltonian(
            inner=self.ham, perm=jnp.asarray(perm.astype(np.int32)),
            inv=jnp.asarray(inv.astype(np.int32)))

    def to_flat_order(self, x, basis):
        """Map the block-concatenated vector to the sorted-word
        HeisenbergBasis order."""
        out = np.zeros(basis.size, dtype=np.asarray(x).dtype)
        xs = np.asarray(x)
        off = 0
        for a, (dl, dr) in zip(self.blocks, self.ham.shapes):
            lw = self.left_words[a]
            rw = self.right_words[self.szpc - a]
            blk = xs[off:off + dl * dr].reshape(dl, dr)
            words = (rw.astype(np.uint64)[None, :] << np.uint64(self.n_l)) \
                | lw.astype(np.uint64)[:, None]
            idx = basis.rank(words.reshape(-1))
            out[idx] = blk.reshape(-1)
            off += dl * dr
        return out
