"""autodE glue: conformer searches, symmetry numbers, graph checks (gated).

Capability parity with /root/reference/src/autode/: frame <-> autodE
Molecule conversion (conversion.jl:11-48), molecular-graph isomorphism
(utils.jl:8-28), symmetry number + geometry classification (utils.jl:30-39),
lowest-energy conformer search per species and NCI-complex conformer search
for multi-molecule reaction endpoints (conformers.jl:19-103, xTB-driven).

Without autodE installed, :func:`frame_symmetry` falls back to a
first-party inertia-based geometry classification with symmetry number 1
(conservative: underestimating symmetry biases TST rates by a constant
factor sigma, not the T-dependence).
"""
from __future__ import annotations

import os
import tempfile

import numpy as np

from ..utils.logging import logger
from . import backends
from .xyz import frame_to_xyz, xyz_to_frame

LINEAR_INERTIA_TOL = 1e-2  # amu Å^2: smallest principal moment ~ 0 => linear


def frame_geometry_class(frame) -> int:
    """0 = monoatomic, 1 = linear, 2 = nonlinear — from principal moments."""
    if frame["N_atoms"] == 1:
        return 0
    from ..ase.properties import moments_of_inertia
    moments = moments_of_inertia(frame)
    return 1 if moments[0] < LINEAR_INERTIA_TOL else 2


def frame_to_autode(frame, mult: int = 1, chg: int = 0):
    """frame -> ade.Molecule via tempfile (reference conversion.jl:42-48)."""
    backends.require("autode", backends.HAS_AUTODE, "autodE conversion")
    import autode as ade
    with tempfile.NamedTemporaryFile("w", suffix=".xyz", delete=False) as fh:
        fh.write(frame_to_xyz(frame))
        path = fh.name
    try:
        return ade.Molecule(path, mult=mult, charge=chg)
    finally:
        os.unlink(path)


def autode_to_frame(mol) -> dict:
    """ade.Molecule -> frame (reference conversion.jl:11)."""
    backends.require("autode", backends.HAS_AUTODE, "autodE conversion")
    with tempfile.NamedTemporaryFile("w", suffix=".xyz", delete=False) as fh:
        path = fh.name
    try:
        mol.print_xyz_file(filename=path)
        with open(path) as f2:
            return xyz_to_frame(f2.read())
    finally:
        os.unlink(path)


def autode_is_isomorphic(graph1, graph2) -> bool:
    """Molecular-graph isomorphism (reference utils.jl:18-28)."""
    backends.require("autode", backends.HAS_AUTODE, "graph isomorphism")
    import networkx as nx
    return nx.is_isomorphic(
        graph1, graph2,
        node_match=lambda a, b: a.get("atom_label") == b.get("atom_label"))


def frame_symmetry(frame, mult: int = 1, chg: int = 0) -> tuple[float, int]:
    """(symmetry number, geometry class) of a frame (utils.jl:30-39).

    Uses autodE's symmetry detection when available, else the inertia
    fallback with sigma = 1.
    """
    if backends.HAS_AUTODE:
        mol = frame_to_autode(frame, mult=mult, chg=chg)
        sigma = float(mol.symmetry_number)
        if frame["N_atoms"] == 1:
            geom = 0
        elif bool(mol.is_linear()):
            geom = 1
        else:
            geom = 2
        return sigma, geom
    return 1.0, frame_geometry_class(frame)


def autode_conformer_search(sd, sid, calcdir: str = "./") -> None:
    """Find a species' lowest-energy conformer via autodE/xTB, caching
    symmetry/geometry and updating the geometry (conformers.jl:19-49)."""
    backends.require("autode", backends.HAS_AUTODE, "conformer searches")
    import autode as ade
    mol = frame_to_autode(sd.xyz[sid], mult=sd.cache["mult"][sid],
                          chg=sd.cache["charge"][sid])
    method = ade.methods.XTB()
    cwd = os.getcwd()
    os.makedirs(calcdir, exist_ok=True)
    try:
        os.chdir(calcdir)
        mol.find_lowest_energy_conformer(lmethod=method)
    finally:
        os.chdir(cwd)
    frame = autode_to_frame(mol)
    frame["info"]["energy"] = float(mol.energy.to("ev"))
    sd.xyz[sid] = frame
    sd.cache.setdefault("symmetry", {})[sid] = float(mol.symmetry_number)
    geom = 0 if frame["N_atoms"] == 1 else (1 if mol.is_linear() else 2)
    sd.cache.setdefault("geometry", {})[sid] = geom


def autode_nci_conformer_search(frames: list, mults: list[int],
                                chgs: list[int], calcdir: str = "./") -> dict:
    """Lowest-energy NCI complex of several molecules (conformers.jl:75-103);
    returns the combined system frame."""
    backends.require("autode", backends.HAS_AUTODE, "NCI conformer searches")
    import autode as ade
    mols = [frame_to_autode(f, mult=m, chg=c)
            for f, m, c in zip(frames, mults, chgs)]
    nci = ade.NCIComplex(*mols)
    method = ade.methods.XTB()
    cwd = os.getcwd()
    os.makedirs(calcdir, exist_ok=True)
    try:
        os.chdir(calcdir)
        nci._generate_conformers()
        nci.conformers.optimise(method=method)
        nci.conformers.prune()
        nci._set_lowest_energy_conformer()
    finally:
        os.chdir(cwd)
    frame = autode_to_frame(nci)
    frame["info"]["energy"] = float(nci.energy.to("ev"))
    return frame
