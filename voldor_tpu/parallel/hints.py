"""Sharding hints for multi-chip tracing (no voldor imports — this module
is imported by the hot compute modules and must stay cycle-free).

Single-chip tracing leaves the compute modules untouched: `shard_hint` is
the identity unless a mesh has been activated with `active_mesh(...)` AND
that mesh carries every axis the hint names. Under an active mesh the hint
becomes a `with_sharding_constraint`, and GSPMD propagates the partitioning
through the surrounding vmaps/scans (e.g. constraining the P4P hypothesis
pool on the `hyp` axis makes every chip solve its slice of minimal problems
and turns the meanshift reductions into cross-chip psums — SURVEY §2.8)."""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_ACTIVE: list = []


@contextmanager
def active_mesh(mesh):
    """Activate `mesh` for shard_hint during tracing of the enclosed calls."""
    _ACTIVE.append(mesh)
    try:
        yield
    finally:
        _ACTIVE.pop()


def shard_hint(x, *spec):
    """Constrain `x` to PartitionSpec(*spec) on the active mesh, if any.

    Axis names in `spec` that the active mesh does not carry make the hint
    a no-op (so the same code traces for 1-D `sp` meshes, 2-D `sp`×`hyp`
    meshes, and single-chip)."""
    if not _ACTIVE:
        return x
    mesh = _ACTIVE[-1]
    names = [s for s in spec if isinstance(s, str)]
    if not all(n in mesh.axis_names for n in names):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
