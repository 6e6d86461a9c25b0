"""NaN-tripwire tests (utils/debug.py)."""

import numpy as np
import jax.numpy as jnp

import blockcg_tpu as bc
from blockcg_tpu.operators import DenseOperator
from blockcg_tpu.problems import random_spd
from blockcg_tpu.utils.debug import checked_operator, run_checked


def test_checked_clean_solve_passes():
    n = 64
    op = checked_operator(DenseOperator(A=jnp.asarray(random_spd(n))))
    B = jnp.asarray(np.random.default_rng(0).standard_normal((n, 3)))
    err, (X, info) = run_checked(
        lambda: bc.solve_sbcgrq(op, B, tol=1e-8, max_iter=200)
    )
    err.throw()  # no tripwire
    assert bool(info.converged.all())


def test_checked_trips_on_nan():
    n = 64
    A = random_spd(n)
    A[3, 5] = np.nan
    A[5, 3] = np.nan
    op = checked_operator(DenseOperator(A=jnp.asarray(A)))
    B = jnp.asarray(np.random.default_rng(1).standard_normal((n, 3)))
    err, _ = run_checked(lambda: bc.solve_sbcgrq(op, B, tol=1e-8, max_iter=50))
    try:
        err.throw()
        assert False, "expected the tripwire to fire"
    except Exception as e:
        assert "non-finite" in str(e)
