"""Multi-chip sharding layer: device-mesh placement rules for the
framework's model-parallel axis (the subdomain axis `sbd`).

Design (TPU-first, replaces the reference's TBB shared-memory element
parallelism, Energy.cpp:309-324, and its per-subdomain thread pools):

- Elements are reordered SUBDOMAIN-CONTIGUOUS with equal padding per
  part (partition.build_plan: nEp = P * elem_pad), so sharding the
  element axis into P equal chunks aligns exactly with subdomain
  boundaries. The per-element chain (deformation gradients, flip-SVD,
  Psi/gradient/Hessian evaluation — the per-iteration cost floor)
  then partitions across devices with zero resharding.
- Subdomain-batched solver state (Cholesky factors, equilibration
  diagonals, local index images) shards on its P axis.
- Vertex-sized global fields (positions, velocities, masses) stay
  replicated; the vertex scatter-reduce of per-element gradients is
  XLA's collective to insert (an all-reduce-by-segment over ICI).

Because System/steppers are keyed pytrees (core.StaticPytree), the
placement rules are written against ATTRIBUTE NAMES and apply to any
stepper that carries a System.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# System attributes whose leading axis is the (padded, subdomain-
# contiguous) element axis nEp
ELEM_ATTRS = frozenset({
    "conn_g", "conn_s", "conn_cols", "vol_w", "u_e", "lam_e",
    "g9", "D_soa", "w_e",
})
# attributes whose leading axis is the subdomain axis P
PART_ATTRS = frozenset({
    "l2g", "local_valid", "mass_img", "mass_local", "is_dual",
    "l2shared", "mass_dif",
})


def device_mesh(n_devices, axis="sbd"):
    return Mesh(np.array(jax.devices()[:n_devices]), (axis,))


def _attr_name(path):
    name = None
    for e in path:
        if isinstance(e, jax.tree_util.GetAttrKey):
            name = e.name
    return name


def _system_spec(path, leaf, mesh, axis):
    name = _attr_name(path)
    n = mesh.shape[axis]
    shp = getattr(leaf, "shape", ())
    if (name in ELEM_ATTRS or name in PART_ATTRS) \
            and len(shp) >= 1 and shp[0] % n == 0 and shp[0] >= n:
        return NamedSharding(mesh, P(axis, *([None] * (len(shp) - 1))))
    return NamedSharding(mesh, P())


def shard_system_tree(tree, mesh, axis="sbd"):
    """device_put a System (or a stepper carrying one) with the sbd
    placement: the element axis and the subdomain axis map to `axis`;
    everything else replicates. Placement happens leaf-by-leaf (a
    shardings *tree* of a StaticPytree would not flatten — its leaves
    are not arrays)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, _system_spec(path, leaf, mesh, axis)), tree)


def dot_state_shardings(state, mesh, axis="sbd"):
    """Shardings for a quasi-Newton SimState: element-Hessian slabs on
    the element axis, factors/equilibration on the subdomain axis,
    global vertex fields replicated. Handles both the dense (P, n3, n3)
    factor and the scan-major BTDFactor layout."""
    from .steppers.core import BTDFactor

    rep = NamedSharding(mesh, P())
    n = mesh.shape[axis]

    def chol_spec(leaf):
        if isinstance(state.chol, BTDFactor):
            ok = leaf.ndim >= 2 and leaf.shape[1] % n == 0
            return NamedSharding(mesh, P(None, axis)) if ok else rep
        ok = leaf.ndim >= 1 and leaf.shape[0] % n == 0
        return NamedSharding(mesh, P(axis)) if ok else rep

    def eq_spec(leaf):
        ok = leaf.ndim >= 1 and leaf.shape[0] % n == 0
        return NamedSharding(mesh, P(axis)) if ok else rep

    def eh_spec(leaf):
        ok = leaf.ndim >= 2 and leaf.shape[1] % n == 0
        return NamedSharding(mesh, P(None, axis)) if ok else rep

    return state._replace(
        **{f: rep for f in ("x", "x_n", "v", "x_tilta", "dx_elastic",
                            "fixed", "vel_sign", "released",
                            "lb_s", "lb_t", "lb_rho", "lb_valid")},
        elem_h=eh_spec(state.elem_h),
        chol=jax.tree.map(chol_spec, state.chol),
        equil=jax.tree.map(eq_spec, state.equil),
    )


def shard_for_step(stepper, state, mesh, axis="sbd"):
    """device_put the (stepper, state) pair with the sbd placement; the
    jitted step then runs SPMD with XLA-inserted collectives."""
    st_sh = shard_system_tree(stepper, mesh, axis)
    state_sh = jax.device_put(state, dot_state_shardings(state, mesh, axis))
    return st_sh, state_sh
