"""Loader for the first-party native reaction sampler (csrc/cde_lite.cpp).

The reference orchestrates an *external* Fortran CDE binary for stochastic
graph-driven mechanism sampling (/root/reference/src/exploration/cde.jl:
54-122). This framework ships its own native sampler with the same file
contract (input/Start.xyz -> rxn_*.xyz + input.log), so exploration runs
end-to-end with zero external chemistry binaries. Point
``CDE(cde_exec=...)`` at a real CDE build to use xTB-quality sampling
instead; everything downstream is identical.

The binary is built on demand with g++ (cached in csrc/build/), mirroring
:mod:`kinetica_tpu.chem.native`.
"""
from __future__ import annotations

import os
import subprocess

from ..utils.logging import logger

_CSRC = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", "..",
                                      "csrc"))
_EXEC_PATH = os.path.join(_CSRC, "build", "cde_lite")


def build_cde_lite(force: bool = False) -> str | None:
    """Compile csrc/cde_lite.cpp if needed; return the executable path."""
    src = os.path.join(_CSRC, "cde_lite.cpp")
    if not os.path.isfile(src):
        return None
    if not force and os.path.isfile(_EXEC_PATH) and (
            os.path.getmtime(_EXEC_PATH) >= os.path.getmtime(src)):
        return _EXEC_PATH
    os.makedirs(os.path.dirname(_EXEC_PATH), exist_ok=True)
    try:
        subprocess.run(["g++", "-O3", "-o", _EXEC_PATH, src],
                       check=True, capture_output=True, timeout=300)
        return _EXEC_PATH
    except Exception as exc:
        logger.warning("cde_lite native build failed: %s", exc)
        return None


def get_cde_lite_exec() -> str:
    """Path to the native sampler, building it on first use."""
    path = build_cde_lite()
    if path is None:
        raise RuntimeError(
            "cde_lite could not be built (g++ unavailable or csrc missing); "
            "provide CDE(cde_exec=...) explicitly")
    return path


def write_minimal_template(template_dir: str, nrxn_per_mech: int = 2,
                           valence_range: dict[str, tuple[int, int]] | None = None,
                           movefile_lines: str | None = None) -> str:
    """Create a minimal CDE template directory for the native sampler.

    The exploration drivers copy ``template_dir`` per run and append
    nmcrxn/nrxn/ranseed (cde.jl:66-72); this helper writes the static part
    (valence ranges + optional movefile) so users need no hand-authored
    template to start exploring.
    """
    os.makedirs(template_dir, exist_ok=True)
    lines = ["# cde_lite template (generated)", f"nrxn {nrxn_per_mech}"]
    if movefile_lines is not None:
        with open(os.path.join(template_dir, "moves.in"), "w") as fh:
            fh.write(movefile_lines)
        lines.append("movefile moves.in")
    vr = valence_range or {"H": (0, 1), "C": (0, 4), "N": (0, 3), "O": (0, 2),
                           "S": (0, 2)}
    lines.append("valencerange{")
    for el, (lo, hi) in vr.items():
        lines.append(f"{el} {lo} {hi}")
    lines.append("}")
    with open(os.path.join(template_dir, "input"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return template_dir
