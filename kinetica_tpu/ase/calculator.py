"""ASE-NEB transition-state-theory kinetic calculator.

Capability parity with /root/reference/src/ase/calculator.jl (777 LoC): the
full ab-initio TST pipeline —

* per-species: spin/charge bookkeeping, conformer search (autodE/xTB),
  geometry optimisation, vibrational analysis, per-species disk cache
  (calculator.jl:188-233),
* per-reaction (artifacts keyed by hex reaction hash so caches transfer
  across CRNs): reverse-hash cache reuse, endpoint construction (NCI
  complexes for bimolecular ends), atom mapping of both ends, Kabsch
  alignment + hydrogen permutation, (CI-)NEB -> TS extraction, TS
  vibrations (calculator.jl:239-504),
* reverse-TS reuse and removal of incomplete/unconverged reactions
  (calculator.jl:508-541),
* rate evaluation by Eyring TST (calculator.jl:758-772), delegated to the
  vectorised traceable :mod:`kinetica_tpu.calculators.tst` core — so unlike
  the reference (allows_continuous=false, calculator.jl:778) this
  implementation supports continuous variable-rate solves too.

The electronic-structure legwork requires ASE (+ autodE for conformers);
construction fails fast with a clear error when they are missing.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..calculators.base import KineticCalculator
from ..calculators.tst import ThermoTable, TSTCalculator
from ..chem import atom_map_smiles, backends, get_species_stats
from ..chem.autode_glue import (autode_conformer_search,
                                autode_nci_conformer_search, frame_symmetry)
from ..chem.conversion import atom_map_frame
from ..chem.elements import atomic_mass
from ..chem.xyz import frame_species
from ..core.network import RxData, SpeciesData
from ..utils.logging import flush_log, logger
from ..utils.time_units import tconvert
from . import io as aseio
from .neb import get_initial_sys_mult, get_rxn_mult, highest_energy_frame, neb
from .optimise import geomopt_species
from .properties import (correct_magmoms_for_mult, get_charge_cached,
                         get_formal_charges_cached,
                         get_initial_magmoms_cached, get_mult_cached,
                         kabsch_fit_frame, get_hydrogen_idxs,
                         moments_of_inertia, permute_hydrogens)
from .vibrations import calc_species_vibrations, calc_ts_vibrations


@dataclass
class ASENEBCalculator(KineticCalculator):
    """NEB/TST calculator (reference calculator.jl:1-144 field set)."""
    calc_builder: object
    calcdir: str = "./"
    # NEB configuration
    n_images: int = 11
    neb_k: float = 0.1
    interpolation: str = "idpp"
    neb_optimiser: str = "ode"
    climb: bool = True
    ftol: float = 0.01
    climb_ftol: float = 0.1
    maxiters: int = 500
    parallel: bool = False
    # geometry opt / vibrations
    geom_optimiser: str = "BFGSLineSearch"
    geom_fmax: float = 0.01
    vib_delta: float = 0.01
    # imaginary-frequency tolerance (reference calculator.jl:93 default
    # 1e-2), converted to an eV imaginary-energy tolerance via
    # conversion.imaginary_ve_tol; set imaginary_ve_tol to override the
    # converted value directly with an explicit eV magnitude.
    imaginary_freq_tol: float = 1e-2
    imaginary_ve_tol: float | None = None
    # behaviour
    remove_unconverged: bool = True
    k_max: float | None = None
    t_unit: str = "s"
    kwargs: dict = field(default_factory=dict)

    def __post_init__(self):
        backends.require("ase", backends.HAS_ASE,
                         "the ASE-NEB TST calculator")
        if self.imaginary_ve_tol is None:
            from .conversion import imaginary_ve_tol as _ivetol
            self.imaginary_ve_tol = _ivetol(self.imaginary_freq_tol)
        self.t_mult = tconvert(self.t_unit, "s")
        self.sd: SpeciesData | None = None
        self.rd: RxData | None = None
        self.ts_cache: dict = {"xyz": {}, "mult": {}, "charge": {},
                               "symmetry": {}, "geometry": {},
                               "vib_energies": {}, "conv": {}}
        self._tst: TSTCalculator | None = None

    allows_continuous = True  # rates evaluate through traceable TST math

    # ------------------------------------------------------------------
    def has_conditions(self, symbols) -> bool:
        return all(s in ("T", "P") for s in symbols)

    def splice(self, rids) -> None:
        rids = set(int(r) for r in rids)
        if not rids or self.rd is None:
            return
        keep = [i for i in range(self.rd.nr) if i not in rids]
        for key in self.ts_cache:
            old = self.ts_cache[key]
            self.ts_cache[key] = {new: old[i] for new, i in enumerate(keep)
                                  if i in old}
        self._tst = None

    # ------------------------------------------------------------------
    def setup_network(self, sd: SpeciesData, rd: RxData) -> None:
        """Run the full data-acquisition pipeline (calculator.jl:146-551)."""
        self.sd, self.rd = sd, rd
        os.makedirs(self.calcdir, exist_ok=True)

        # --- whole-calculator checkpoint restore (io.jl:12-133) ---
        # Verified against the live network before anything is adopted
        # (verify_sd/verify_rd, io.jl:191-239): on mismatch the checkpoint
        # is ignored and setup falls back to the per-rhash artifact cache.
        chk = aseio.load_calculator_checkpoint(self.calcdir)
        if chk is not None:
            if (aseio.verify_sd(chk.get("species_smiles", {}), sd)
                    and aseio.verify_rd(chk.get("rhashes", []), rd)):
                ts_by_rhash = chk.get("ts_by_rhash", {})
                restored = 0
                for rid in range(rd.nr):
                    ent = ts_by_rhash.get(rd.rhash[rid].hex())
                    if ent is not None and rid not in self.ts_cache["conv"]:
                        self._store_ts(rid, ent["xyz"], ent["conv"],
                                       ent["vib_energies"], ent)
                        restored += 1
                if restored:
                    logger.info(" - Restored %d reaction(s) from calculator "
                                "checkpoint.", restored)
            else:
                logger.warning(" - Calculator checkpoint inconsistent with "
                               "current network; ignoring it.")

        # --- per-species properties, conformers, optimisation, vibrations
        active = set()
        for rid in range(rd.nr):
            active.update(rd.id_reacs[rid])
            active.update(rd.id_prods[rid])
        for cache_name in ("mult", "charge", "formal_charges",
                           "initial_magmoms", "symmetry", "geometry",
                           "vib_energies"):
            sd.cache.setdefault(cache_name, {})

        for sid in sorted(active):
            cached = aseio.load_optgeom(self.calcdir, sid)
            if cached is not None:
                frame, props = cached
                if props.get("smiles") == sd.toStr[sid]:
                    sd.xyz[sid] = frame
                    for name in ("mult", "charge", "symmetry", "geometry",
                                 "vib_energies"):
                        sd.cache[name][sid] = props[name]
                    sd.cache["formal_charges"][sid] = np.asarray(
                        props["formal_charges"])
                    sd.cache["initial_magmoms"][sid] = np.asarray(
                        props["initial_magmoms"])
                    continue
            logger.info(" - Setting up species %d (%s)", sid, sd.toStr[sid])
            flush_log()
            get_mult_cached(sd, sid)
            get_charge_cached(sd, sid)
            get_formal_charges_cached(sd, sid)
            get_initial_magmoms_cached(sd, sid)
            spec_dir = aseio.species_dir(self.calcdir, sid)
            os.makedirs(spec_dir, exist_ok=True)
            if backends.HAS_AUTODE:
                autode_conformer_search(sd, sid, calcdir=spec_dir)
            else:
                sigma, geom = frame_symmetry(sd.xyz[sid])
                sd.cache["symmetry"][sid] = sigma
                sd.cache["geometry"][sid] = geom
            geomopt_species(sd, sid, self.calc_builder, calcdir=spec_dir,
                            optimiser=self.geom_optimiser, fmax=self.geom_fmax,
                            **self.kwargs)
            calc_species_vibrations(sd, sid, self.calc_builder,
                                    calcdir=spec_dir, delta=self.vib_delta,
                                    ivetol=self.imaginary_ve_tol,
                                    **self.kwargs)
            aseio.save_optgeom(self.calcdir, sid, sd.xyz[sid], {
                "smiles": sd.toStr[sid],
                "mult": sd.cache["mult"][sid],
                "charge": sd.cache["charge"][sid],
                "symmetry": sd.cache["symmetry"][sid],
                "geometry": sd.cache["geometry"][sid],
                "vib_energies": list(sd.cache["vib_energies"][sid]),
                "formal_charges": np.asarray(
                    sd.cache["formal_charges"][sid]).tolist(),
                "initial_magmoms": np.asarray(
                    sd.cache["initial_magmoms"][sid]).tolist(),
            })
        get_species_stats(sd)

        # --- per-reaction endpoints, NEB, TS vibrations
        incomplete: list[int] = []
        for rid in range(rd.nr):
            if rid in self.ts_cache["conv"]:
                continue
            try:
                self._setup_reaction(rid)
                # checkpoint after every completed reaction so an
                # interrupted setup resumes without redoing converged work
                self._save_checkpoint(active)
            except Exception as exc:
                logger.warning("Reaction %d TS setup failed: %s", rid, exc)
                incomplete.append(rid)

        # reuse converged reverse TSs for unconverged forward slots
        # (calculator.jl:508-525)
        hash_to_rid = {rd.rhash[i]: i for i in range(rd.nr)}
        for rid in range(rd.nr):
            if self.ts_cache["conv"].get(rid):
                continue
            rev = rd.get_reverse_rhash(self.sd, rid)
            rev_rid = hash_to_rid.get(rev)
            if rev_rid is not None and self.ts_cache["conv"].get(rev_rid):
                logger.info("Reusing converged reverse TS for reaction %d", rid)
                for key in self.ts_cache:
                    if rev_rid in self.ts_cache[key]:
                        self.ts_cache[key][rid] = self.ts_cache[key][rev_rid]

        # final checkpoint BEFORE removal: keyed by rhash, so a fresh
        # setup over the same (full) network restores every completed
        # reaction, converged or not (io.jl:12-133)
        self._save_checkpoint(active)

        # remove incomplete/unconverged reactions (calculator.jl:527-541)
        bad = [rid for rid in range(rd.nr)
               if rid in incomplete
               or (self.remove_unconverged
                   and not self.ts_cache["conv"].get(rid, False))]
        if bad:
            logger.info("Removing %d incomplete/unconverged reactions from "
                        "network.", len(bad))
            rd.splice(bad)
            self.splice(bad)
        self._tst = None

    # ------------------------------------------------------------------
    def _endpoint_system(self, sids: list[int], stoics: list[int],
                         rxn_dir: str):
        """Build one aligned endpoint frame for a reaction side
        (calculator.jl:341-435)."""
        sd = self.sd
        frames, mults, chgs = [], [], []
        for sid, st in zip(sids, stoics):
            for _ in range(st):
                frames.append(sd.xyz[sid])
                mults.append(sd.cache["mult"][sid])
                chgs.append(sd.cache["charge"][sid])
        if len(frames) == 1:
            system = dict(frames[0])
        elif backends.HAS_AUTODE:
            system = autode_nci_conformer_search(frames, mults, chgs,
                                                 calcdir=rxn_dir)
        else:
            from ..exploration.molecule_system import system_from_mols
            system = system_from_mols([dict(f) for f in frames], dmin=2.5)
        smis = ".".join(sorted(
            sd.toStr[sid] for sid, st in zip(sids, stoics) for _ in range(st)))
        system.setdefault("info", {})
        system["info"]["n_species"] = len(frames)
        system["info"]["mult"] = get_initial_sys_mult(mults)
        system["info"]["chg"] = int(sum(chgs))
        system["info"]["smiles"] = smis
        return system

    def _setup_reaction(self, rid: int) -> None:
        rd, sd = self.rd, self.sd
        rhash = rd.rhash[rid]
        rxn_dir = aseio.rhash_dir(self.calcdir, rhash)
        os.makedirs(rxn_dir, exist_ok=True)
        logger.info(" - Setting up reaction %d (%s)", rid, rhash.hex()[:12])
        flush_log()

        cached_ts = aseio.load_tsdata(self.calcdir, rhash)
        cached_vib = aseio.load_vibdata(self.calcdir, rhash)
        if cached_ts is not None and cached_vib is not None:
            ts, conv, extras = cached_ts
            self._store_ts(rid, ts, conv, cached_vib, extras)
            return

        endpoints = aseio.load_endpoints(self.calcdir, rhash)
        if endpoints is None:
            reacsys = self._endpoint_system(rd.id_reacs[rid],
                                            rd.stoic_reacs[rid], rxn_dir)
            prodsys = self._endpoint_system(rd.id_prods[rid],
                                            rd.stoic_prods[rid], rxn_dir)
            # atom-map both endpoints onto the mapped reaction SMILES and
            # align (calculator.jl:341-435)
            mapped = rd.mapped_rxns[rid]
            if mapped and ">>" in mapped:
                m_reac, m_prod = mapped.split(">>")
                try:
                    reacsys_frame = atom_map_frame(m_reac, reacsys)
                    prodsys_frame = atom_map_frame(m_prod, prodsys)
                    reacsys_frame["info"] = reacsys["info"]
                    prodsys_frame["info"] = prodsys["info"]
                    reacsys, prodsys = reacsys_frame, prodsys_frame
                    prodsys = kabsch_fit_frame(prodsys, reacsys)
                    prodsys = permute_hydrogens(
                        prodsys, get_hydrogen_idxs(m_prod), reacsys)
                except Exception as exc:
                    logger.debug("Endpoint atom mapping skipped: %s", exc)
            rxn_mult = get_rxn_mult(
                reacsys["info"]["n_species"], reacsys["info"]["mult"],
                prodsys["info"]["n_species"], prodsys["info"]["mult"])
            r_mm = np.zeros(reacsys["N_atoms"])
            p_mm = np.zeros(prodsys["N_atoms"])
            try:
                r_mm, p_mm = correct_magmoms_for_mult(r_mm, p_mm, rxn_mult)
            except ValueError:
                pass
            reacsys["info"]["mult"] = rxn_mult
            prodsys["info"]["mult"] = rxn_mult
            reacsys["info"]["initial_magmoms"] = r_mm.tolist()
            prodsys["info"]["initial_magmoms"] = p_mm.tolist()
            reacsys["info"]["formal_charges"] = [0.0] * reacsys["N_atoms"]
            prodsys["info"]["formal_charges"] = [0.0] * prodsys["N_atoms"]
            aseio.save_endpoints(self.calcdir, rhash, reacsys, prodsys)
        else:
            reacsys, prodsys = endpoints

        images, conv = neb(reacsys, prodsys, self, calcdir=rxn_dir,
                           **self.kwargs)
        ts = highest_energy_frame(images)
        sigma, geom = frame_symmetry(ts, mult=reacsys["info"]["mult"],
                                     chg=reacsys["info"]["chg"])
        extras = {"mult": reacsys["info"]["mult"],
                  "charge": reacsys["info"]["chg"],
                  "symmetry": sigma, "geometry": geom}
        aseio.save_tsdata(self.calcdir, rhash, ts, conv, extras)

        tmp_cache = {"xyz": {rid: ts}, "mult": {rid: extras["mult"]},
                     "charge": {rid: extras["charge"]},
                     "geometry": {rid: geom}, "vib_energies": {}}
        calc_ts_vibrations(tmp_cache, rid, self.calc_builder, calcdir=rxn_dir,
                           delta=self.vib_delta, ivetol=0.0, **self.kwargs)
        vibs = tmp_cache["vib_energies"][rid]
        aseio.save_vibdata(self.calcdir, rhash, vibs)
        self._store_ts(rid, ts, conv, vibs, extras)

    def _save_checkpoint(self, active) -> None:
        """Whole-calculator checkpoint: verified network snapshot + the
        TS cache keyed by reaction hash (io.jl:12-133)."""
        sd, rd = self.sd, self.rd
        ts_by_rhash = {}
        for rid, conv in self.ts_cache["conv"].items():
            if rid >= rd.nr:
                continue
            ts_by_rhash[rd.rhash[rid].hex()] = {
                "xyz": self.ts_cache["xyz"][rid],
                "mult": self.ts_cache["mult"][rid],
                "charge": self.ts_cache["charge"][rid],
                "symmetry": self.ts_cache["symmetry"][rid],
                "geometry": self.ts_cache["geometry"][rid],
                "vib_energies": list(self.ts_cache["vib_energies"][rid]),
                "conv": bool(conv),
            }
        aseio.save_calculator_checkpoint(self.calcdir, {
            "species_smiles": {int(sid): sd.toStr[sid]
                               for sid in sorted(active)},
            "rhashes": [h.hex() for h in rd.rhash],
            "ts_by_rhash": ts_by_rhash,
        })

    def _store_ts(self, rid, ts, conv, vibs, extras) -> None:
        self.ts_cache["xyz"][rid] = ts
        self.ts_cache["mult"][rid] = extras.get("mult", 1)
        self.ts_cache["charge"][rid] = extras.get("charge", 0)
        self.ts_cache["symmetry"][rid] = extras.get("symmetry", 1.0)
        self.ts_cache["geometry"][rid] = extras.get("geometry", 2)
        self.ts_cache["vib_energies"][rid] = list(vibs)
        self.ts_cache["conv"][rid] = bool(conv)

    # ------------------------------------------------------------------
    def _build_tst(self) -> TSTCalculator:
        sd, rd = self.sd, self.rd
        get_species_stats(sd)
        vib_lists, inertias, geoms, syms, mults, energies, masses = \
            [], [], [], [], [], [], []
        for sid in range(sd.n):
            vib_lists.append(list(sd.cache["vib_energies"].get(sid, [])))
            frame = sd.xyz[sid] or {}
            inert = frame.get("arrays", {}).get("inertias")
            if inert is None and frame:
                inert = moments_of_inertia(frame)
            inertias.append(np.asarray(inert if inert is not None
                                       else [0.0, 0.0, 0.0]))
            geoms.append(sd.cache["geometry"].get(sid, 2))
            syms.append(sd.cache["symmetry"].get(sid, 1.0))
            mults.append(sd.cache["mult"].get(sid, 1))
            energies.append(frame.get("info", {}).get("energy_ASE", 0.0))
            masses.append(sd.cache["weights"][sid])
        species = ThermoTable.from_lists(masses, inertias, geoms, syms, mults,
                                         energies, vib_lists)

        ts_vibs, ts_inert, ts_geom, ts_sym, ts_mult, ts_E, ts_mass = \
            [], [], [], [], [], [], []
        for rid in range(rd.nr):
            ts = self.ts_cache["xyz"][rid]
            ts_vibs.append(list(self.ts_cache["vib_energies"][rid]))
            inert = ts.get("arrays", {}).get("inertias")
            if inert is None:
                inert = moments_of_inertia(ts)
            ts_inert.append(np.asarray(inert))
            ts_geom.append(self.ts_cache["geometry"][rid])
            ts_sym.append(self.ts_cache["symmetry"][rid])
            ts_mult.append(self.ts_cache["mult"][rid])
            ts_E.append(ts.get("info", {}).get("energy_ASE",
                                               ts.get("info", {}).get("energy", 0.0)))
            ts_mass.append(sum(atomic_mass(s) for s in frame_species(ts)))
        ts_table = ThermoTable.from_lists(ts_mass, ts_inert, ts_geom, ts_sym,
                                          ts_mult, ts_E, ts_vibs)
        return TSTCalculator(species, ts_table, rd.id_reacs, rd.stoic_reacs,
                             k_max=self.k_max, t_unit=self.t_unit)

    def __call__(self, T, P, **_):
        if self._tst is None:
            if self.sd is None:
                raise RuntimeError("setup_network must run before rate "
                                   "evaluation")
            self._tst = self._build_tst()
        return self._tst(T=T, P=P)
