"""Variable sets for multi-variable / scalar POD.

The reference's POD is not velocity-only: its packed snapshot vector is a
sequence of ``num_cells``-sized *slots*, one per scalar variable and three
per vector variable (``save_Planes`` packing, PODFS.py:706-734:
``A[cc*Np:(cc+1)*Np, snap]`` with ``cc`` advancing per component), described
by a comma-separated ``var_name`` string with per-variable vector flags
(``i_d.PODVarVec``, PODFS.py:337/399) or legacy name-based detection
(``velocity``/``U``/``SprayVelocity`` are vectors, PODFS.py:217/305).

This module is the typed rebuild of that convention; every exporter
(io/prf.py, io/vtk.py, io/hdf5.py), the compressor (compress.py) and the
replay evaluators (replay.py, native/podfs_replay.c) consume it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np

#: names the reference treats as 3-vectors without an explicit flag
#: (PODFS.py:217, 305)
VECTOR_NAMES = ("velocity", "U", "SprayVelocity")

#: .prf / HDF5 column names of the velocity components
_VELOCITY_COLUMNS = ("u", "v", "w")


@dataclass(frozen=True)
class Variable:
    """One POD variable: a scalar (``ncomp=1``) or a 3-vector."""
    name: str
    ncomp: int = 1

    def __post_init__(self):
        if self.ncomp not in (1, 3):
            raise ValueError(
                f"variable {self.name!r}: ncomp must be 1 (scalar) or 3 "
                f"(vector); got {self.ncomp}")

    @property
    def is_vector(self) -> bool:
        return self.ncomp == 3

    @property
    def column_names(self) -> Tuple[str, ...]:
        """Data-column names: ``u,v,w`` for velocity-named vectors (the
        reference's .prf layout), ``<name>_1..3`` for other vectors, the
        bare name for scalars."""
        if self.ncomp == 1:
            return (self.name,)
        if self.name in VECTOR_NAMES:
            return _VELOCITY_COLUMNS
        return tuple(f"{self.name}_{k + 1}" for k in range(self.ncomp))


@dataclass(frozen=True)
class VariableSet:
    """Ordered variables defining the packed snapshot layout.

    Packed vector layout (identical to the reference's, PODFS.py:706-734):
    slot ``cc`` occupies rows ``[cc*Np, (cc+1)*Np)``; a vector variable owns
    three consecutive slots (components in order), a scalar owns one.
    """
    variables: Tuple[Variable, ...]

    def __post_init__(self):
        if not self.variables:
            raise ValueError("VariableSet needs at least one variable")
        names = [v.name for v in self.variables]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate variable names: {names}")

    # -- constructors -----------------------------------------------------
    @staticmethod
    def velocity() -> "VariableSet":
        """The main-path default: one 3-vector named ``velocity``."""
        return VariableSet((Variable("velocity", 3),))

    @staticmethod
    def from_names(names: Sequence[str],
                   vector_flags: Sequence[bool] | None = None) -> "VariableSet":
        """Build from names; without explicit ``vector_flags`` the
        reference's name-based detection applies (VECTOR_NAMES are vectors,
        everything else scalar — PODFS.py:217/305)."""
        if vector_flags is None:
            vector_flags = [n in VECTOR_NAMES for n in names]
        if len(vector_flags) != len(names):
            raise ValueError("vector_flags length must match names")
        return VariableSet(tuple(
            Variable(n, 3 if v else 1) for n, v in zip(names, vector_flags)))

    @staticmethod
    def parse(spec: str) -> "VariableSet":
        """Parse a CLI spec: comma-separated names, each optionally
        ``name:ncomp`` (e.g. ``velocity:3,k,epsilon`` — bare names use the
        reference's name-based vector detection)."""
        vs = []
        for tok in spec.split(","):
            tok = tok.strip()
            if not tok:
                continue
            if ":" in tok:
                name, nc = tok.split(":", 1)
                vs.append(Variable(name.strip(), int(nc)))
            else:
                vs.append(Variable(tok, 3 if tok in VECTOR_NAMES else 1))
        return VariableSet(tuple(vs))

    # -- layout -----------------------------------------------------------
    @property
    def num_slots(self) -> int:
        return sum(v.ncomp for v in self.variables)

    @property
    def var_name(self) -> str:
        """The reference's comma-joined ``var_name`` string (used verbatim in
        VTK mode file names, PODFS.py:298)."""
        return ",".join(v.name for v in self.variables)

    @property
    def column_names(self) -> Tuple[str, ...]:
        out = []
        for v in self.variables:
            out.extend(v.column_names)
        return tuple(out)

    def slot_ranges(self):
        """Yield ``(variable, first_slot)`` pairs in packed order."""
        cc = 0
        for v in self.variables:
            yield v, cc
            cc += v.ncomp

    # -- packing ----------------------------------------------------------
    def pack(self, fields: Sequence[np.ndarray]) -> np.ndarray:
        """Stack per-variable point fields into the packed layout.

        ``fields[i]`` is ``(Np,)`` for a scalar or ``(Np, 3)`` (or
        ``(3, Np)``) for a vector; trailing time axes are allowed
        (``(Np, 3, Ns)`` / ``(Np, Ns)``) and preserved:
        returns ``(num_slots*Np, ...)``.
        """
        if len(fields) != len(self.variables):
            raise ValueError(
                f"{len(self.variables)} variables but {len(fields)} fields")
        slots = []
        for v, f in zip(self.variables, fields):
            f = np.asarray(f)
            if v.ncomp == 1:
                slots.append(f)
            else:
                if f.shape[0] == 3 and (f.ndim == 1 or f.shape[0] != f.shape[1]):
                    comps = [f[k] for k in range(3)]
                elif f.ndim >= 2 and f.shape[1] == 3:
                    comps = [f[:, k] for k in range(3)]
                else:
                    raise ValueError(
                        f"vector field {v.name!r} must be (Np,3,...) or "
                        f"(3,Np,...); got {f.shape}")
                slots.extend(comps)
        return np.concatenate(slots, axis=0)

    def unpack(self, packed: np.ndarray, num_points: int) -> dict:
        """Packed ``(num_slots*Np, ...)`` -> ``{name: (Np[,3],...)}``."""
        out = {}
        for v, cc in self.slot_ranges():
            block = packed[cc * num_points:(cc + v.ncomp) * num_points]
            if v.ncomp == 1:
                out[v.name] = block
            else:
                out[v.name] = np.stack(
                    [block[k * num_points:(k + 1) * num_points]
                     for k in range(3)], axis=1)
        return out

    def table(self, packed: np.ndarray, num_points: int) -> np.ndarray:
        """Packed ``(num_slots*Np,)`` -> per-point ``(Np, num_slots)`` table
        (the ``order='F'`` reshape of the reference's pod2prf,
        PODFS.py:1694/1758)."""
        return np.asarray(packed).reshape((num_points, self.num_slots),
                                          order="F")
