"""Kinetic calculator interface.

Contract mirrors the reference
(/root/reference/src/solving/calculator.jl:1-66 and
docs/src/development/calculator-interface.md:5-15): a calculator must
implement

* ``setup_network(sd, rd)`` — validate/populate network-dependent state,
* ``splice(rids)`` — drop per-reaction parameters for removed reactions,
* ``has_conditions(symbols)`` — declare supported condition symbols,
* ``allows_continuous`` — True only when rate laws are traceable closed
  forms (here: plain jnp code), enabling continuous variable-rate solves,
* ``__call__(**conditions)`` — return the full per-reaction rate-constant
  vector for given conditions. Conditions may be python floats *or traced
  jnp scalars/arrays*; calculators must broadcast, which is what lets the
  solve core embed ``k(T(t))`` directly in the RHS.
"""
from __future__ import annotations

import jax.numpy as jnp


class KineticCalculator:
    allows_continuous: bool = False

    def setup_network(self, sd, rd) -> None:
        raise NotImplementedError

    def splice(self, rids) -> None:
        raise NotImplementedError

    def has_conditions(self, symbols) -> bool:
        raise NotImplementedError

    def __call__(self, **conditions) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def _apply_k_max(k, k_max):
        """Harmonic cap 1/(1/k_max + 1/k) (reference calculator.jl:223-226)."""
        if k_max is None:
            return k
        return 1.0 / (1.0 / k_max + 1.0 / k)


def splice_network_and_calc(rd, calc: KineticCalculator, rids) -> None:
    """Remove reactions from both network and calculator
    (reference calculator.jl:60-66)."""
    rd.splice(rids)
    calc.splice(rids)
