"""Distributed solver entry points (T-D2 + L4 surface, SURVEY.md §4.3).

The same jitted solver bodies (solvers/) run SPMD inside ``shard_map`` over a
1-D row mesh: the operator pytree is row-sharded, the RHS block lanes-major
row-sharded, and every reduction goes through the solvers' ``axis_name``
psum hook. Works identically on a real pod slice and on the fake CPU mesh
(``--xla_force_host_platform_device_count``, SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.solvers.cg import _cg_impl
from blockcg_tpu.solvers.bcg import _bcg_impl
from blockcg_tpu.solvers.sbcgrq import _sbcgrq_impl
from blockcg_tpu.solvers.shifted_block import _shifted_sbcgrq_impl

try:  # jax >= 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def row_mesh(num_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    """1-D mesh over all (or the first N) devices (T-D2)."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return jax.make_mesh((len(devs),), (axis_name,), devices=devs)


def _info_specs(record_history: bool, per_rhs: bool = False):
    return SolverInfo(
        iterations=P(),
        relres=P(),
        converged=P(),
        matvecs=P(),
        history=P() if record_history else None,
        per_rhs_iters=P() if per_rhs else None,
    )


def _field_pspec(dop, axis):
    fp = getattr(dop, "field_pspec", None)
    return fp() if fp is not None else P(None, axis)


def _put_field(dop, B, mesh, axis):
    """Global (n, k) RHS -> lanes-major internal field, sharded on sites."""
    Bt = B.T
    to_int = getattr(dop, "to_internal", None)
    if to_int is not None:
        Bt = to_int(Bt)
    return jax.device_put(Bt, NamedSharding(mesh, _field_pspec(dop, axis)))


# shard_map closures are rebuilt per call; without caching every solve call
# would recompile (5-100 s through this sandbox's remote-compile tunnel —
# measured 200x the device time of the solve itself). Key on everything the
# closure bakes in: mesh, operator structure, solver statics and tol.
_SHARD_FN_CACHE: dict = {}


def _cached_jit(key, make):
    fn = _SHARD_FN_CACHE.get(key)
    if fn is None:
        fn = _SHARD_FN_CACHE[key] = jax.jit(make())
    return fn


def _dop_key(dop, mesh):
    return (
        mesh,
        jax.tree_util.tree_structure(dop),
        str(_field_pspec(dop, dop.axis_name)),
    )


def solve_sbcgrq_dist(
    dop,
    B: jax.Array,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    qr_passes: int = 1,
    replace_every: int = 0,
    record_history: bool = False,
    replace_kappa: float = 0.0,
) -> tuple[jax.Array, SolverInfo]:
    """Row-sharded SBCGrQ. ``dop`` is a Dist*Operator from parallel.dist_ops;
    ``B`` is (n, k) in the operator's distributed row ordering. Defaults
    mirror solve_sbcgrq: adaptive 1-pass QR; replacement opt-in. The
    kappa/adaptive predicates are computed from post-psum k x k Grams, so
    every device takes the same lax.cond branch."""
    axis = dop.axis_name
    Bt = _put_field(dop, B, mesh, axis)
    replace_kappa = float(replace_kappa)

    def body(op, bt):
        x0 = jnp.zeros_like(bt)
        return _sbcgrq_impl(
            op, bt, x0, tol, max_iter,
            qr_passes=qr_passes, replace_every=replace_every,
            axis_name=axis, record_history=record_history,
            replace_kappa=replace_kappa,
        )

    key = ("sbcgrq", _dop_key(dop, mesh), float(tol), max_iter, qr_passes,
           replace_every, record_history, replace_kappa)
    fn = _cached_jit(key, lambda: shard_map(
        body,
        mesh=mesh,
        in_specs=(dop.in_specs(), _field_pspec(dop, axis)),
        out_specs=(_field_pspec(dop, axis),
                   _info_specs(record_history, per_rhs=True)),
        check_vma=True,
    ))
    Xt, info = fn(dop, Bt)
    return _field_result(dop, mesh, Xt), info


def _field_result(dop, mesh, Xt):
    """Return X as (n, k). Internal block layouts (3D spin view, or the
    merged spin-major (m, ns) of the const-hop path) need their spin rows
    merged back into flat rows — not expressible as a sharded reshape, so
    single-process runs gather once at the API boundary. Multi-process
    (pod) runs cannot gather; the result comes back in DISTRIBUTED row
    order (shard-major, then the operator's local row order — convert with
    parallel.from_dist_order / the operator's host codec)."""
    import numpy as np

    conv = getattr(dop, "result_from_internal_np", None)
    if Xt.ndim == 2 and conv is None:
        return Xt.T
    if jax.process_count() > 1:
        axis = dop.axis_name
        key = ("flatten", _dop_key(dop, mesh))
        if conv is None:
            local = lambda x: x.reshape(x.shape[0], -1)
        else:
            local = dop.from_internal  # shard-local merge (reshape+swap)
        fn = _cached_jit(key, lambda: shard_map(
            local,
            mesh=mesh,
            in_specs=(_field_pspec(dop, axis),),
            out_specs=P(None, axis),
            check_vma=True,
        ))
        return fn(Xt).T
    Xn = np.asarray(jax.device_get(Xt))
    if conv is not None:
        return jnp.asarray(conv(Xn)).T
    return jnp.asarray(Xn.reshape(Xn.shape[0], -1)).T


def solve_bcg_dist(
    dop,
    B: jax.Array,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    axis = dop.axis_name
    Bt = _put_field(dop, B, mesh, axis)

    def body(op, bt):
        x0 = jnp.zeros_like(bt)
        return _bcg_impl(
            op, bt, x0, tol, max_iter, axis_name=axis,
            record_history=record_history,
        )

    key = ("bcg", _dop_key(dop, mesh), float(tol), max_iter, record_history)
    fn = _cached_jit(key, lambda: shard_map(
        body,
        mesh=mesh,
        in_specs=(dop.in_specs(), _field_pspec(dop, axis)),
        out_specs=(_field_pspec(dop, axis), _info_specs(record_history)),
        check_vma=True,
    ))
    Xt, info = fn(dop, Bt)
    return _field_result(dop, mesh, Xt), info


def solve_shifted_sbcgrq_dist(
    dop,
    B: jax.Array,
    sigmas,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    qr_passes: int = 2,
) -> tuple[jax.Array, SolverInfo]:
    """Row-sharded multi-shift block solve: (A + sigma_j I) X_j = B for all
    shifts with one distributed Krylov space (one halo exchange + the usual
    k x k psums per iteration, shared across every shift)."""
    axis = dop.axis_name
    sig = jnp.asarray(sigmas)
    Bt = _put_field(dop, B, mesh, axis)

    def body(op, bt, sg):
        return _shifted_sbcgrq_impl(
            op, bt, sg, tol, max_iter, qr_passes, axis
        )

    key = ("shifted_sbcgrq", _dop_key(dop, mesh), float(tol), max_iter,
           qr_passes, int(sig.shape[0]))
    fspec = _field_pspec(dop, axis)
    xs_spec = P(*((None,) + tuple(fspec)))  # leading shift axis replicatedly
    fn = _cached_jit(key, lambda: shard_map(
        body,
        mesh=mesh,
        in_specs=(dop.in_specs(), fspec, P()),
        out_specs=(xs_spec, _info_specs(False)),
        check_vma=True,
    ))
    Xs, info = fn(dop, Bt, sig)
    outs = [_field_result(dop, mesh, Xs[j]) for j in range(int(sig.shape[0]))]
    if jax.process_count() > 1:
        # Pod runs cannot gather: per-shift results stay distributed
        # (shard-major row order, see _field_result) — stack on device.
        return jnp.stack([jnp.asarray(o) for o in outs]), info
    return jnp.asarray(np.stack([np.asarray(o) for o in outs])), info


def solve_cg_dist(
    dop,
    b: jax.Array,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    axis = dop.axis_name
    if (str(_field_pspec(dop, axis)) != str(P(None, axis))
            or getattr(dop, "result_from_internal_np", None) is not None):
        raise TypeError(
            "solve_cg_dist supports flat row-sharded operators only; block "
            "operators (spin field views) go through solve_bcg_dist/"
            "solve_sbcgrq_dist"
        )
    bl = jax.device_put(b, NamedSharding(mesh, P(axis)))

    def body(op, bv):
        bf = bv[None, :]  # lanes-major single-row field (_cg_impl convention)
        xf, info = _cg_impl(
            op, bf, jnp.zeros_like(bf), tol, max_iter, axis_name=axis,
            record_history=record_history,
        )
        return xf[0], info

    key = ("cg", _dop_key(dop, mesh), float(tol), max_iter, record_history)
    fn = _cached_jit(key, lambda: shard_map(
        body,
        mesh=mesh,
        in_specs=(dop.in_specs(), P(axis)),
        out_specs=(P(axis), _info_specs(record_history)),
        check_vma=True,
    ))
    return fn(dop, bl)


def solve_psbcgrq_dist(
    dop,
    B: jax.Array,
    M,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    qr_passes: int = 2,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    """Row-sharded preconditioned SBCGrQ. ``M`` is a JacobiPreconditioner
    (its ``dinv_int`` rides sharded on the site axis) or any pytree
    operator applying shard-locally on the internal field view."""
    from blockcg_tpu.solvers.pbcg import JacobiPreconditioner, _psbcgrq_impl

    axis = dop.axis_name
    Bt = _put_field(dop, B, mesh, axis)

    def body(op, m_, bt):
        x0 = jnp.zeros_like(bt)
        return _psbcgrq_impl(
            op, m_, bt, x0, tol, max_iter, qr_passes, axis, record_history,
        )

    if isinstance(M, JacobiPreconditioner):
        m_specs = JacobiPreconditioner(
            dinv_int=P(None, axis) if M.dinv_int.ndim == 2 else P(axis)
        )
    else:
        m_specs = M.in_specs()
    key = ("psbcgrq", _dop_key(dop, mesh), float(tol), max_iter, qr_passes,
           record_history, jax.tree_util.tree_structure(M))
    fn = _cached_jit(key, lambda: shard_map(
        body,
        mesh=mesh,
        in_specs=(dop.in_specs(), m_specs, _field_pspec(dop, axis)),
        out_specs=(_field_pspec(dop, axis), _info_specs(record_history)),
        check_vma=True,
    ))
    Xt, info = fn(dop, M, Bt)
    return _field_result(dop, mesh, Xt), info
