"""Sparse-tile operator — the general-sparsity container (arbitrary CSR/BSR).

Built from any scipy matrix via the native C++ tilizer (blockcg_tpu/native.py)
with numpy fallback; applies through the Pallas sparse-tile kernel on TPU
(ops/spmm_tiled.py) and an XLA gather/segment-sum path elsewhere.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blockcg_tpu.operators.base import MatmatMixin


@dataclasses.dataclass
class TiledOperator(MatmatMixin):
    tiles: jax.Array   # (ntiles, T, T) f32 dense tiles
    rt: jax.Array      # (ntiles,) int32 row-tile index, sorted
    ct: jax.Array      # (ntiles,) int32 col-tile index
    first: jax.Array   # (ntiles,) int32 first-in-row-tile flag
    n: int

    @property
    def T(self) -> int:
        return self.tiles.shape[1]

    @property
    def ntiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        # logical nnz if recorded at construction; padded size otherwise
        return getattr(self, "_nnz", self.ntiles * self.T * self.T)

    @property
    def dtype(self):
        return self.tiles.dtype

    @classmethod
    def from_scipy(
        cls, a, dtype=jnp.float32, force_numpy: bool = False,
        max_pad_bytes: int = 8 << 30,
    ):
        from blockcg_tpu.native import tilize_csr

        a = a.tocsr()
        n = a.shape[0]
        T = 128
        if n % T:  # pad to a tile multiple with identity on the diagonal
            import scipy.sparse as sp

            npad = T - n % T
            a = sp.block_diag([a, sp.eye(npad)], format="csr")
            n = a.shape[0]
        # The tile format targets block-dense sparsity: estimate the padded
        # footprint first — truly scattered matrices (one nnz per 128x128
        # tile) would blow up memory by ~16000x. Use CSR/ELL (XLA gather
        # path) for those; TPU hardware gathers span only 128 lanes, so no
        # Pallas fast path exists for arbitrary scatter.
        col_t = np.asarray(a.indices).astype(np.int64) // T
        indptr = np.asarray(a.indptr)
        rtile = np.repeat(np.arange(n, dtype=np.int64) // T, np.diff(indptr))
        ntiles_est = int(np.unique(rtile * (n // T) + col_t).size)
        pad_bytes = ntiles_est * T * T * 4
        if pad_bytes > max_pad_bytes:
            raise ValueError(
                f"matrix too scattered for the {T}x{T} tile format: "
                f"{ntiles_est} tiles = {pad_bytes/2**30:.1f} GiB padded "
                f"(fill {a.nnz/(ntiles_est*T*T):.2%}); use CSROperator/"
                f"ELLOperator instead"
            )
        tiles, rt, ct, first = tilize_csr(
            a, T, force_numpy=force_numpy, dtype=np.dtype(jnp.dtype(dtype).name)
        )
        op = cls(
            tiles=jnp.asarray(tiles, dtype=dtype),
            rt=jnp.asarray(rt),
            ct=jnp.asarray(ct),
            first=jnp.asarray(first),
            n=int(n),
        )
        object.__setattr__(op, "_nnz", int(a.nnz))
        return op

    def matmat_t(self, Xt: jax.Array) -> jax.Array:
        import os

        if (
            jax.default_backend() == "tpu"
            and self.dtype == jnp.float32
            and Xt.dtype == jnp.float32
            and not os.environ.get("BLOCKCG_NO_PALLAS")
        ):
            from blockcg_tpu.ops.spmm_tiled import tiled_spmm_t

            return tiled_spmm_t(self.tiles, self.rt, self.ct, self.first, Xt)
        return self._matmat_t_xla(Xt)

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        k, n = Xt.shape
        T = self.T
        Xb = Xt.reshape(k, n // T, T)
        xg = Xb[:, self.ct, :]  # (k, ntiles, T)
        contrib = jax.lax.dot_general(
            xg, self.tiles,
            (((2,), (2,)), ((1,), (0,))),  # contract T, batch over tiles
            preferred_element_type=Xt.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # (ntiles, k, T)
        Yb = jax.ops.segment_sum(
            contrib, self.rt, num_segments=n // T, indices_are_sorted=True
        )  # (n//T, k, T)
        return jnp.transpose(Yb, (1, 0, 2)).reshape(k, n)


jax.tree_util.register_dataclass(
    TiledOperator,
    data_fields=["tiles", "rt", "ct", "first"],
    meta_fields=["n"],
)
