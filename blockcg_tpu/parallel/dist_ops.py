"""Row-sharded distributed operators (T-D1, SURVEY.md §4.3).

Each distributed operator is a pytree whose array fields are *globally*
shaped and annotated P(None, ..., 'rows') on the row/site axis; inside
``shard_map`` the same dataclass holds the local shard. ``matmat_t`` must run
inside ``shard_map`` (or on a 1-shard mesh).

Per apply:
  1. launch ring halo exchange of the boundary columns of Xt (ppermute),
  2. compute the *interior* SpMM — the Pallas stencil kernel on the local
     shard, with cross-shard slots zeroed out of the interior diagonals; this
     does not depend on the halos, so XLA's latency-hiding scheduler overlaps
     it with the ppermute,
  3. apply the small boundary corrections from the received halos
     (bw-wide slice FMAs).

This is the ring-attention-style overlap mechanism applied to stencil halos
(SURVEY.md §3.3). The n-sized data never moves: per iteration the only
cross-device traffic is 2 x (k x bw) halos + the k x k psums.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blockcg_tpu.operators.base import MatmatMixin
from blockcg_tpu.operators.dia import DIAOperator
from blockcg_tpu.operators.bdia import BlockDIAOperator
from blockcg_tpu.parallel.halo import ring_halos


@dataclasses.dataclass
class DistDIAOperator(MatmatMixin):
    """Row-sharded DIA operator.

    diags_int: (ndiag, n) interior diagonals (cross-shard slots zeroed),
      shard as P(None, 'rows').
    diags_bl / diags_br: (ndiag, D*bw) boundary coefficients for rows within
      ``bw`` of the left/right shard edge, shard as P(None, 'rows').
    """

    diags_int: jax.Array
    diags_bl: jax.Array
    diags_br: jax.Array
    offsets: tuple[int, ...]
    bw: int
    axis_name: str

    @property
    def nl(self) -> int:
        return self.diags_int.shape[1]  # local rows (inside shard_map)

    @property
    def dtype(self):
        return self.diags_int.dtype

    def matmat_t(self, Xt: jax.Array) -> jax.Array:
        bw = self.bw
        halo_l, halo_r = ring_halos(Xt, bw, self.axis_name)
        # Interior SpMM — independent of the halos (overlappable).
        Y = DIAOperator(diags=self.diags_int, offsets=self.offsets).matmat_t(Xt)
        nl = Xt.shape[1]
        for d, o in enumerate(self.offsets):  # boundary corrections
            if o < 0:
                m = -o
                c = self.diags_bl[d, :m][None, :]
                Y = Y.at[:, :m].add(c * halo_l[:, bw - m :])
            elif o > 0:
                c = self.diags_br[d, bw - o :][None, :]
                Y = Y.at[:, nl - o :].add(c * halo_r[:, :o])
        return Y

    def in_specs(self):
        from jax.sharding import PartitionSpec as P

        return DistDIAOperator(
            diags_int=P(None, self.axis_name),
            diags_bl=P(None, self.axis_name),
            diags_br=P(None, self.axis_name),
            offsets=self.offsets,
            bw=self.bw,
            axis_name=self.axis_name,
        )


jax.tree_util.register_dataclass(
    DistDIAOperator,
    data_fields=["diags_int", "diags_bl", "diags_br"],
    meta_fields=["offsets", "bw", "axis_name"],
)


def partition_dia(op: DIAOperator, D: int, axis_name: str = "rows") -> DistDIAOperator:
    """Host-side partition plan (SURVEY.md T-D1 'halo-plan on host, once').

    Splits each diagonal into an interior part (target row in the same shard)
    and boundary parts (target in a ring neighbor's shard). Requires D | n
    and bandwidth <= n/D.
    """
    diags = np.asarray(op.diags)
    offsets = op.offsets
    ndiag, n = diags.shape
    if n % D:
        raise ValueError(f"n={n} not divisible by D={D}")
    nl = n // D
    bw = max(abs(o) for o in offsets)
    if bw > nl:
        raise ValueError(f"bandwidth {bw} exceeds shard size {nl}")

    j = np.arange(n) % nl  # position within shard
    diags_int = diags.copy()
    diags_bl = np.zeros((ndiag, D * bw), dtype=diags.dtype)
    diags_br = np.zeros((ndiag, D * bw), dtype=diags.dtype)
    s = np.arange(n) // nl
    for d, o in enumerate(offsets):
        crosses = (j + o < 0) | (j + o >= nl)
        diags_int[d, crosses] = 0.0
        if o < 0:
            sel = j + o < 0  # rows [0, -o) of each shard
            diags_bl[d, s[sel] * bw + j[sel]] = diags[d, sel]
        elif o > 0:
            sel = j + o >= nl  # rows [nl-o, nl) of each shard
            diags_br[d, s[sel] * bw + (j[sel] - (nl - bw))] = diags[d, sel]
    return DistDIAOperator(
        diags_int=jnp.asarray(diags_int),
        diags_bl=jnp.asarray(diags_bl),
        diags_br=jnp.asarray(diags_br),
        offsets=offsets,
        bw=bw,
        axis_name=axis_name,
    )


@dataclasses.dataclass
class DistBlockDIAOperator(MatmatMixin):
    """Row(site)-sharded BlockDIA operator.

    Sharding is over *sites*; each local shard keeps all bs spin planes
    (row ordering: shard-major, then spin, then site — use
    ``to_dist_order`` / ``from_dist_order`` to convert block fields).

    blocks_int: (noff, bs, bs, ns) with cross-shard slots zeroed,
      P(None, None, None, 'rows'); blocks_bl/br: (noff, bs, bs, D*bw).
    """

    blocks_int: jax.Array
    blocks_bl: jax.Array
    blocks_br: jax.Array
    offsets: tuple[int, ...]
    bw: int
    axis_name: str

    @property
    def bs(self) -> int:
        return self.blocks_int.shape[1]

    @property
    def dtype(self):
        return self.blocks_int.dtype

    def matmat_t(self, Xt: jax.Array) -> jax.Array:
        """Xt: (k, bs*ns_l) local, spin-major within the shard."""
        bs, bw = self.bs, self.bw
        k = Xt.shape[0]
        ns_l = Xt.shape[1] // bs
        Xv = Xt.reshape(k, bs, ns_l)
        halo_l, halo_r = ring_halos(Xv, bw, self.axis_name)
        # Interior SpMM — independent of the halos (overlappable).
        Y = BlockDIAOperator(
            blocks=self.blocks_int, offsets=self.offsets
        ).matmat_t(Xt)
        Yv = Y.reshape(k, bs, ns_l)
        for d, o in enumerate(self.offsets):  # boundary corrections
            if o == 0:
                continue
            for a in range(bs):
                for b in range(bs):
                    if o < 0:
                        m = -o
                        c = self.blocks_bl[d, a, b, :m][None, :]
                        Yv = Yv.at[:, a, :m].add(c * halo_l[:, b, bw - m :])
                    else:
                        c = self.blocks_br[d, a, b, bw - o :][None, :]
                        Yv = Yv.at[:, a, ns_l - o :].add(c * halo_r[:, b, :o])
        return Yv.reshape(k, bs * ns_l)

    def in_specs(self):
        from jax.sharding import PartitionSpec as P

        spec = P(None, None, None, self.axis_name)
        return DistBlockDIAOperator(
            blocks_int=spec,
            blocks_bl=spec,
            blocks_br=spec,
            offsets=self.offsets,
            bw=self.bw,
            axis_name=self.axis_name,
        )


jax.tree_util.register_dataclass(
    DistBlockDIAOperator,
    data_fields=["blocks_int", "blocks_bl", "blocks_br"],
    meta_fields=["offsets", "bw", "axis_name"],
)


def partition_bdia(
    op: BlockDIAOperator, D: int, axis_name: str = "rows"
) -> DistBlockDIAOperator:
    blocks = np.asarray(op.blocks)
    offsets = op.offsets
    noff, bs, _, ns = blocks.shape
    if ns % D:
        raise ValueError(f"ns={ns} not divisible by D={D}")
    ns_l = ns // D
    bw = max(abs(o) for o in offsets)
    if bw > ns_l:
        raise ValueError(f"site bandwidth {bw} exceeds shard size {ns_l}")

    j = np.arange(ns) % ns_l
    s = np.arange(ns) // ns_l
    blocks_int = blocks.copy()
    blocks_bl = np.zeros((noff, bs, bs, D * bw), dtype=blocks.dtype)
    blocks_br = np.zeros((noff, bs, bs, D * bw), dtype=blocks.dtype)
    for d, o in enumerate(offsets):
        crosses = (j + o < 0) | (j + o >= ns_l)
        blocks_int[d][:, :, crosses] = 0.0
        if o < 0:
            sel = j + o < 0
            blocks_bl[d][:, :, s[sel] * bw + j[sel]] = blocks[d][:, :, sel]
        elif o > 0:
            sel = j + o >= ns_l
            blocks_br[d][:, :, s[sel] * bw + (j[sel] - (ns_l - bw))] = blocks[d][
                :, :, sel
            ]
    return DistBlockDIAOperator(
        blocks_int=jnp.asarray(blocks_int),
        blocks_bl=jnp.asarray(blocks_bl),
        blocks_br=jnp.asarray(blocks_br),
        offsets=offsets,
        bw=bw,
        axis_name=axis_name,
    )


def to_dist_order(X: np.ndarray, bs: int, D: int) -> np.ndarray:
    """Reorder an (n, k) block from global spin-major rows (a*ns + s) to the
    distributed ordering (shard-major, spin, site-within-shard)."""
    n = X.shape[0]
    ns = n // bs
    ns_l = ns // D
    Xv = X.reshape(bs, D, ns_l, -1)  # (a, shard, site_l, k)
    return np.transpose(Xv, (1, 0, 2, 3)).reshape(n, -1)


def from_dist_order(X: np.ndarray, bs: int, D: int) -> np.ndarray:
    n = X.shape[0]
    ns = n // bs
    ns_l = ns // D
    Xv = X.reshape(D, bs, ns_l, -1)
    return np.transpose(Xv, (1, 0, 2, 3)).reshape(n, -1)
