"""Numeric mass-action formulation of a CRN — the TPU-facing network model.

This replaces the reference's Catalyst/ModelingToolkit symbolic pipeline
(``make_rs`` -> ``ReactionSystem`` -> ``structural_simplify`` -> codegen,
/root/reference/src/solving/solve_utils.jl:318-349 and methods.jl:150-157)
with a *fixed-shape numeric formulation* built once on the host:

* ``reac_slots`` — (nr, arity) int32 indices into an augmented concentration
  vector ``u_aug = concat(u, [1.0])``; padding slots point at the trailing
  constant so each reaction rate is exactly ``k_j * prod_s u_aug[slot_js]``.
* ``N`` — (nr, ns) dense net stoichiometry (nu+ - nu-), so
  ``du = r @ N`` is a single MXU matmul (batched over profiles for free).
* ``E`` — (arity, nr, ns) one-hot slot matrices (zero rows for padding),
  giving the analytic Jacobian as matmuls:
  ``J = N^T @ sum_s (w_s[:, None] * E_s)`` with
  ``w_s = k * prod_{s' != s} u_aug[slot_s']``.

Everything is statically shaped, differentiable, and vmappable; reaction
removal (splice/filter/low-k) is a host-side rebuild of these arrays, which
costs milliseconds instead of an MTK recompile.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.network import RxData



# Smoothing half-width of the clipped-concentration kink (see _clip_pos):
# the default and CAP. Networks built through a solve path scale it with
# the requested accuracy via resolve_clip_delta (ADVICE r2: a fixed
# absolute width systematically damps species near 1e-12 regardless of
# the user's tolerances).
CLIP_DELTA = 1e-12


def resolve_clip_delta(pars=None) -> float:
    """Clip width for one solve: ``pars.clip_delta`` if explicit, else
    ``min(CLIP_DELTA, 0.01 * abstol)`` — two decades below the requested
    accuracy, never wider than the historical 1e-12 default."""
    if pars is None:
        return CLIP_DELTA
    choice = getattr(pars, "clip_delta", "auto")
    if choice == "auto":
        return min(CLIP_DELTA, 0.01 * float(getattr(pars, "abstol", 1e-10)))
    return float(choice)


def _clip_pos(u, delta=CLIP_DELTA):
    """C^inf positive part: u * sigmoid(u / delta); exactly 0 at u = 0.

    Rates are evaluated on the nonnegative part of u (see rates()), but a
    SHARP max(u, 0) makes the RHS only C^0: species flickering across 0
    at the tolerance floor (every radical during its exponential rise
    crosses decades below atol) flip the consumption-term slope
    discontinuously between Newton iterates, injecting O(c k u_partner)
    scaled residual jumps the one-sided Jacobian cannot model. Measured
    on the k_max-saturated getting-started CRN this trapped the stepper
    in a small-h Newton-thrash cycle (43k steps / 0.5 s where scipy BDF
    takes ~100). Smoothing the kink over delta = 1e-12 — two decades
    below the production atol, so rate perturbations are invisible at
    solver tolerances — makes RHS and Jacobian consistent through the
    crossing.

    The sigmoid form (not the sqrt softplus) is essential: it VANISHES at
    u = 0, so freshly-initialised zero species carry no phantom
    concentration (a delta/2 offset times a saturated k ~ 1e12 would
    inject O(1) phantom fluxes). For |u| >> delta this is max(u, 0) to
    machine precision.
    """
    return u * jax.nn.sigmoid(u / delta)


def _clip_pos_grad(u, delta=CLIP_DELTA):
    """d(_clip_pos)/du — chain factor for the Jacobian."""
    x = u / delta
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@jax.tree_util.register_pytree_node_class
@dataclass
class MassActionNetwork:
    """Padded dense arrays describing mass-action kinetics of one CRN.

    Contraction-form note (measured on TPU v5e, 64-member vmapped sweep of
    the 603-reaction CRN): the f64 RHS contraction ``r @ N`` is fastest as
    the plain dense dot. XLA emulates the f64 ``dot_general`` with an
    8x4-way f32 splitting through the MXU (389 ms/profile end-to-end);
    sparse alternatives lose — a segment-sum/scatter formulation
    serialises under vmap (1432 ms/profile) and a per-species gather +
    masked-sum runs off the MXU entirely (733 ms/profile). Keep the dot.
    """
    reac_slots: jnp.ndarray  # (nr, arity) int32 into u_aug (ns == constant-1 slot)
    N: jnp.ndarray           # (nr, ns) net stoichiometry
    # smooth-clip width (static aux data; see _clip_pos/resolve_clip_delta)
    delta: float = CLIP_DELTA

    def tree_flatten(self):
        return (self.reac_slots, self.N), self.delta

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, delta=aux)

    @property
    def ns(self) -> int:
        return self.N.shape[1]

    @property
    def nr(self) -> int:
        return self.N.shape[0]

    @property
    def arity(self) -> int:
        return self.reac_slots.shape[1]

    # ---- pure kinetics functions (all jit/vmap-safe) ----

    def rates(self, u: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """Per-reaction rates r_j = k_j * prod_s u_aug[slot_js].

        Rates are evaluated on the nonnegative part of u (standard practice
        in production combustion codes, e.g. Cantera). Tolerance-level
        negative excursions are unavoidable in any ODE solve, and for a
        quadratic self-consumption reaction a negative concentration is
        *explosively* unstable (du/dt = -k u^2 < 0 for u < 0 blows up in
        finite time 1/(k|u|) — sub-second at k ~ 1e12). Clipping makes the
        u < 0 region purely restoring (production only) without changing
        the dynamics anywhere u >= 0.
        """
        u_aug = jnp.concatenate([_clip_pos(u, self.delta),
                                 jnp.ones((1,), dtype=u.dtype)])
        prods = jnp.prod(u_aug[self.reac_slots], axis=1)
        return k * prods

    def rhs(self, u: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """du/dt = N^T r — one matvec on the MXU (see class docstring for
        why the dense dot beats sparse formulations even in emulated f64)."""
        r = self.rates(u, k)
        return r @ self.N

    def _slot_weights(self, u: jnp.ndarray, k: jnp.ndarray):
        """Shared Jacobian prep: (w, chain) with w[j, s] = k_j *
        prod_{s'!=s} u_aug[slot_js'] (the dr_j/du coefficient of slot s)
        and chain = d(_clip_pos)/du applied per Jacobian column, so RHS
        and Jacobian agree through the u ~ 0 crossing (see _clip_pos)."""
        u_aug = jnp.concatenate([_clip_pos(u, self.delta),
                                 jnp.ones((1,), dtype=u.dtype)])
        chain = _clip_pos_grad(u, self.delta)
        slot_u = u_aug[self.reac_slots]                      # (nr, arity)

        def leave_one_out(slots_u):
            ar = slots_u.shape[0]
            mask = ~jnp.eye(ar, dtype=bool)
            tiled = jnp.where(mask, slots_u[None, :], 1.0)
            return jnp.prod(tiled, axis=1)

        w = k[:, None] * jax.vmap(leave_one_out)(slot_u)      # (nr, arity)
        return w, chain

    def jac(self, u: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """Analytic Jacobian d(du/dt)/du, shape (ns, ns) — segment-sum form.

        J = N^T @ G with G[j, slot_js] = w_js, w_js = k_j prod_{s'!=s}
        u_aug[slot_js'].  G has at most ``arity`` nonzeros per row, so both
        contractions are done as a segment-sum over the (reaction, slot)
        pairs instead of dense matmuls: the flop count drops from
        ns*nr*ns to arity*nr*ns, and (decisive for f64 Jacobians on TPU,
        where f64 matmuls are software-emulated) no f64 matmul is needed
        at all — on a 603-reaction CRN this is ~13x faster per f64
        evaluation at bit-identical values. For the f32 preconditioner
        Jacobian on TPU the MXU matmul form (:meth:`jac_matmul`) wins
        instead — see ``ODESimulationParams.jac_form``. Padding slots
        point at the constant-1 column (index ns), which is dropped
        before returning (matching d(1)/du = 0).
        """
        w, chain = self._slot_weights(u, k)
        nr, arity = self.reac_slots.shape
        ns = self.N.shape[1]
        # rows of (dr_j/du_m = w_js at m=slot_js) scaled by N_j, summed into
        # J^T columns by segment: J^T[m] = sum_{(j,s): slot_js=m} w_js N[j]
        Y = (self.N[:, None, :] * w[:, :, None]).reshape(nr * arity, ns)
        JT = jax.ops.segment_sum(Y, self.reac_slots.reshape(-1),
                                 num_segments=ns + 1)
        return JT[:ns].T * chain[None, :]

    def jac_matmul(self, u: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """Analytic Jacobian in MXU matmul form (TPU f32 hot path).

        Same values as :meth:`jac` (to rounding), different contraction:
        J^T = sum_s E_s^T @ (w_s . N) with E_s the one-hot slot matrix
        (nr, ns+1) of slot s. Rationale (device trace at 4473 rxns / 181
        species / B=64): the segment-sum form materialises a
        (B, nr*arity, ns) gather intermediate (~414 MB) and lowers to
        scatter-adds that serialise; the matmul form is ``arity`` batched
        f32 dot_generals on the MXU at half the operand traffic. The slot
        concentrations are ALSO read through the one-hot matrices (su_s =
        E_s @ u_aug) instead of a gather — the vmapped (B, nr, arity)
        gather alone cost ~1 ms/eval at nc=24/B=64 (profile_trace), the
        matvec is ~free and EXACT at HIGHEST precision (every product is
        1.0 * u or 0.0 * u, reassembled exactly by the f32 splitting).
        Precision HIGHEST throughout keeps f32-rounding accuracy (default
        bf16 passes would cost ~3 digits of the preconditioner).
        """
        u_aug = jnp.concatenate([_clip_pos(u, self.delta),
                                 jnp.ones((1,), dtype=u.dtype)])
        chain = _clip_pos_grad(u, self.delta)
        ns = self.N.shape[1]
        dt = self.N.dtype
        hi = lax.Precision.HIGHEST
        E = [jax.nn.one_hot(self.reac_slots[:, s], ns + 1, dtype=dt)
             for s in range(self.arity)]
        su = [lax.dot_general(e, u_aug.astype(dt), (((1,), (0,)), ((), ())),
                              precision=hi)
              for e in E]                                   # (nr,) per slot
        # leave-one-out slot products via prefix/suffix chains (no
        # division: zero concentrations are common and meaningful)
        a = self.arity
        prefix = [None] * a
        suffix = [None] * a
        acc = None
        for s in range(a):
            prefix[s] = acc
            acc = su[s] if acc is None else acc * su[s]
        acc = None
        for s in reversed(range(a)):
            suffix[s] = acc
            acc = su[s] if acc is None else acc * su[s]
        JT = None
        for s in range(a):
            w_s = k.astype(dt)
            if prefix[s] is not None:
                w_s = w_s * prefix[s]
            if suffix[s] is not None:
                w_s = w_s * suffix[s]
            term = lax.dot_general(E[s], w_s[:, None] * self.N,
                                   (((0,), (0,)), ((), ())), precision=hi)
            JT = term if JT is None else JT + term
        return JT[:ns].T * chain[None, :]

    def rhs_and_jac(self, u, k):
        return self.rhs(u, k), self.jac(u, k)

    def rates_pair(self, u, k_pair):
        """Per-reaction rates in double-f32 pair form (TPU hot path).

        ``k_pair = (k_hi, k_lo)`` f32 arrays (split once per step by the
        integrator's prepare hook). The whole evaluation — gather, arity
        product, k scaling — runs in error-free-transformed f32 pair
        arithmetic (~2^-45 relative, ops/dd.py), avoiding every f64
        elementwise op over the (nr,)-sized axis; downstream the pair
        feeds the sliced-compensated contraction kernel. Semantics match
        :meth:`rates` (clipped-nonnegative concentrations).
        """
        from ..ops import dd

        u_aug = jnp.concatenate([_clip_pos(u),
                                 jnp.ones((1,), dtype=u.dtype)])
        uh, ul = dd.pair_from_f64(u_aug)
        kh, kl = k_pair
        rh, rl = kh, kl
        for s in range(self.arity):
            sh = uh[self.reac_slots[:, s]]
            sl_ = ul[self.reac_slots[:, s]]
            rh, rl = dd.pair_mul(rh, rl, sh, sl_)
        return rh, rl


def build_mass_action(rd: RxData, ns: int, dtype=jnp.float64,
                      min_arity: int = 2,
                      clip_delta: float = CLIP_DELTA) -> MassActionNetwork:
    """Compile an :class:`RxData` into padded dense numeric arrays.

    ``ns`` is the species count (``sd.n``). Reactant molecularity beyond 2
    (e.g. after :func:`insert_inert`) is handled by widening ``arity``.
    """
    nr = rd.nr
    arity = max([min_arity] + [sum(s) for s in rd.stoic_reacs]) if nr else min_arity
    reac_slots = np.full((max(nr, 1), arity), ns, dtype=np.int32)
    N = np.zeros((max(nr, 1), ns), dtype=np.float64)
    for j in range(nr):
        slot = 0
        for sid, st in zip(rd.id_reacs[j], rd.stoic_reacs[j]):
            N[j, sid] -= st
            for _ in range(st):
                reac_slots[j, slot] = sid
                slot += 1
        for sid, st in zip(rd.id_prods[j], rd.stoic_prods[j]):
            N[j, sid] += st
    return MassActionNetwork(
        reac_slots=jnp.asarray(reac_slots),
        N=jnp.asarray(N, dtype=dtype),
        delta=float(clip_delta),
    )


def pad_reactions(net: MassActionNetwork, nr_padded: int) -> MassActionNetwork:
    """Pad the reaction axis with inert slots up to ``nr_padded``.

    Padding reactions reference only the constant-1 slot and carry zero
    stoichiometry, so (with zero-padded rate vectors) they contribute
    nothing to rates, RHS, or Jacobian. Used to make ``nr`` divisible by
    a ``model``-axis mesh size for reaction-axis sharding
    (parallel.sharding.ensemble_shardings).
    """
    nr, ns = net.nr, net.ns
    if nr_padded < nr:
        raise ValueError(f"nr_padded {nr_padded} < nr {nr}")
    if nr_padded == nr:
        return net
    pad = nr_padded - nr
    slots = jnp.concatenate(
        [net.reac_slots,
         jnp.full((pad, net.arity), ns, dtype=net.reac_slots.dtype)])
    N = jnp.concatenate([net.N, jnp.zeros((pad, ns), dtype=net.N.dtype)])
    return MassActionNetwork(reac_slots=slots, N=N, delta=net.delta)


@partial(jax.jit, static_argnums=())
def fd_jacobian(net: MassActionNetwork, u, k):
    """Autodiff fallback Jacobian — used in tests to validate the analytic one."""
    return jax.jacfwd(lambda uu: net.rhs(uu, k))(u)
