"""LinearOperator protocol (L2 public interface, SURVEY.md §2.2).

The reference applies ``A`` through Eigen sparse-times-dense products
(SURVEY.md R1). Here every operator is a *pytree dataclass* so it can be
passed straight through ``jax.jit`` / ``shard_map``: array leaves are traced,
structural metadata (shape, format parameters) is static.

The only method solvers rely on is ``matmat(X) -> A @ X`` for an (n, k) block
X (k may be 1). Operators also expose ``nnz`` (for nnz/s metrics) and
``shape``.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax


@runtime_checkable
class LinearOperator(Protocol):
    """Anything that can apply ``A @ X`` to an (n, k) dense block."""

    @property
    def shape(self) -> tuple[int, int]: ...

    @property
    def nnz(self) -> int: ...

    def matmat(self, X: jax.Array) -> jax.Array: ...

    def __call__(self, X: jax.Array) -> jax.Array: ...


class MatmatMixin:
    """``op(X)`` as an alias for ``op.matmat(X)``."""

    def __call__(self, X):
        return self.matmat(X)
