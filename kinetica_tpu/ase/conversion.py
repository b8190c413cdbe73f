"""Frame <-> ase.Atoms conversion (ASE-gated).

Capability parity with /root/reference/src/ase/conversion.jl: frames carry
initial charges/magmoms into Atoms (conversion.jl:16-36), Atoms come back
as frames with energies/inertias (conversion.jl:50-64), and
:func:`imaginary_ve_tol` converts an imaginary-frequency tolerance in
cm^-1 to the eV energy magnitude ASE reports (conversion.jl:72-74).
"""
from __future__ import annotations

import numpy as np

from ..chem import backends, frame_positions, frame_species, make_frame

INVCM_TO_EV = 1.23984193e-4  # 1 cm^-1 in eV


def frame_to_atoms(frame, formal_charges=None, initial_magmoms=None):
    """Build an ase.Atoms from a frame (conversion.jl:16-36)."""
    backends.require("ase", backends.HAS_ASE, "ASE Atoms conversion")
    from ase import Atoms
    atoms = Atoms(symbols="".join(frame_species(frame)),
                  positions=frame_positions(frame))
    if formal_charges is not None:
        atoms.set_initial_charges(np.asarray(formal_charges, dtype=float))
    if initial_magmoms is not None:
        atoms.set_initial_magnetic_moments(
            np.asarray(initial_magmoms, dtype=float))
    return atoms


def atoms_to_frame(atoms, energy=None, inertias=None):
    """Build a frame from an ase.Atoms (conversion.jl:50-64)."""
    backends.require("ase", backends.HAS_ASE, "ASE Atoms conversion")
    frame = make_frame([str(s) for s in atoms.get_chemical_symbols()],
                       np.asarray(atoms.get_positions()))
    if energy is None:
        try:
            energy = float(atoms.get_potential_energy())
        except Exception:
            energy = None
    if energy is not None:
        frame["info"]["energy_ASE"] = energy
    if inertias is None:
        try:
            inertias = np.asarray(atoms.get_moments_of_inertia())
        except Exception:
            inertias = None
    if inertias is not None:
        frame["arrays"]["inertias"] = np.asarray(inertias).tolist()
    return frame


def imaginary_ve_tol(tol_invcm: float) -> float:
    """Imaginary-mode tolerance cm^-1 -> eV magnitude (conversion.jl:72-74)."""
    return abs(tol_invcm) * INVCM_TO_EV
