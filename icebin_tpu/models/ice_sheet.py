"""JAX ice-sheet model: the PISM stand-in for the coupling runtime.

Reference: ``IceCoupler_PISM`` embeds the full PISM ice-sheet model (PETSc,
MPI) in-process (reference: ``slib/icebin/pism/IceCoupler_PISM.*`` [U];
SURVEY.md section 2).  PISM itself is out of scope; the north star
(BASELINE.json config #4) requires a "PISM-style ice grid" transient loop --
an SMB-driven ice model on the projected lattice whose state evolves so the
coupler's matrix-regeneration, E1vE0 remap, and conservation machinery are
exercised for real.

The model implemented here couples TWO conserved columns per cell:

* **Mass** -- shallow-ice-approximation (SIA) thickness evolution:

      dH/dt = smb/rho_ice + div( D(H, grad s) * grad s ),   s = bed + H

  with D the SIA diffusivity D = Gamma H^{n+2} |grad s|^{n-1} (Glen n=3),
  explicit Euler with a diffusive CFL-limited internal substep.  Mass is
  exactly conserved by construction (flux-form divergence; zero-flux at
  margins).

* **Energy** (round 4) -- a single-layer enthalpy column U [J m-2]
  (internal energy relative to ice at the melting point; negative =
  "cold content").  U receives the contract's surface energy fluxes
  (``smb_enth`` + ``deltah`` + ``heat_flux``) and the basal geothermal
  flux, ADVECTS with the SIA mass flux (donor-cell upwind specific
  enthalpy riding each face flux -- flux-form, exactly conservative), and
  DRIVES melt: positive column energy (temperate excess) melts ice at the
  base at rate U/(rho L) -- the genuine ``basal_melt`` output flux, fed by
  the energy path rather than by surface temperature (reference: PISM's
  enthalpy-based energy balance consumes pism_in smb_enth/heat flux and
  produces basal melt from the basal energy budget [U IceCoupler_PISM];
  VERDICT r3 missing #2).  Every energy removal (melt latent, enthalpy
  share of shed mass, zero-thickness clamps) is accumulated EXACTLY as it
  is applied, so the coupler's energy ledger closes by construction.

PDD surface melt (tsurf-driven) remains as the ``runoff`` flux; its latent
heat is *implied* by the parameterization (not drawn from U -- the known
PDD idealization) and is booked as its own ledger row.

Everything is jit-compatible: state is a pytree of dense lattice arrays,
the step is pure, and the stencil operations are XLA shifts (no gathers),
so the model shards over an ice-domain-decomposed device mesh with halo
exchange via shard_map (``icebin_tpu.parallel``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["IceSheetConfig", "IceSheetState", "IceFluxes", "init_state",
           "step", "step_coupled", "ablation_ghosted",
           "sia_flux_div_ghosted", "sia_flux_div_energy_ghosted",
           "apply_ablation_energy", "RHO_ICE", "GRAVITY", "L_FUSION",
           "C_ICE", "T_MELT"]

RHO_ICE = 910.0        # kg m-3
GRAVITY = 9.81         # m s-2
L_FUSION = 3.34e5      # J kg-1 latent heat of fusion
C_ICE = 2009.0         # J kg-1 K-1 specific heat of ice
T_MELT = 273.15        # K
GLEN_N = 3.0
# SIA softness Gamma = 2 A (rho g)^n / (n + 2), A = 1e-16 Pa-3 yr-1 converted
_A_GLEN = 1e-16 / (365.2425 * 86400.0)   # Pa-3 s-1
GAMMA = 2.0 * _A_GLEN * (RHO_ICE * GRAVITY) ** GLEN_N / (GLEN_N + 2.0)


@dataclasses.dataclass(frozen=True)
class IceSheetConfig:
    nx: int
    ny: int
    dx: float                 # m
    dy: float                 # m
    dt_max: float = 0.1 * 365.2425 * 86400.0   # max internal substep [s]
    n_substeps_max: int = 64  # hard bound on CFL substeps per step
    # -- ablation physics (the ice->GCM mass-LOSS half of the coupling
    #    budget; reference: PISM's surface melt + calving harvested as
    #    pism_out fluxes [U IceCoupler_PISM]) --
    #: PDD-style degree-day melt factor [kg m-2 s-1 K-1]; default is the
    #: canonical 8 mm w.e. K-1 day-1.  Melt = ddf * max(tsurf - melt_t0, 0)
    #: wherever ice is present, clamped at the available thickness.
    ddf: float = 8.0 / 86400.0
    melt_t0: float = T_MELT   # K
    #: margin calving: ice-front cells (an ice-free 4-neighbor) thinner
    #: than calv_thk [m] calve at rate H * (1 - exp(-dt/calv_tau)).
    #: calv_thk = 0 disables calving.
    calv_thk: float = 0.0
    calv_tau: float = 86400.0 * 10.0
    #: initial column temperature [K] for the default enthalpy state
    #: (cold content = C_ICE * (t_init - T_MELT) per kg, negative)
    t_init: float = 263.15
    #: lattice state dtype: "float32" (TPU default) or "float64" --
    #: closure-critical runs/tests use f64 so the mass/energy books close
    #: to 1e-12 instead of f32 quantization (~1e-6 relative)
    dtype: str = "float32"


class IceFluxes(NamedTuple):
    """Per-cell (ny, nx) interval-mean fluxes one coupling step returns.

    Mass rows [kg m-2 s-1, leaving positive]; energy rows [W m-2].  The
    taxonomy matters to the GCM (VERDICT r3 missing #1): ``runoff`` is
    PDD SURFACE melt, ``basal_melt`` comes from the basal/column ENERGY
    budget, ``calving`` is mechanical (reference: distinct pism_out
    fluxes [U contracts/modele_pism.cpp]).
    """

    runoff: jnp.ndarray         # PDD surface melt mass
    basal_melt: jnp.ndarray     # energy-budget melt mass
    calving: jnp.ndarray        # calved mass
    mass_clamp: jnp.ndarray     # mass the >=0 thickness clamp ADDED (the
                                # explicit scheme's margin correction +
                                # unfulfilled negative SMB), booked so the
                                # ledger closes to round-off.  LEDGER-ONLY
                                # row: models may return the SCALAR total
                                # (sum over cells) instead of a per-cell
                                # field -- the coupler only ever sums it
    enth_runoff: jnp.ndarray    # column enthalpy leaving with runoff mass
    enth_basal: jnp.ndarray     # latent energy leaving with basal meltwater
    enth_calving: jnp.ndarray   # column enthalpy leaving with calved mass
    enth_clamp: jnp.ndarray     # enthalpy discarded by zero-thickness
                                # clamps (ledger-only: scalar total allowed)
    latent_pdd: jnp.ndarray     # IMPLIED (atmospheric) share of the
                                # surface-melt latent heat: L_f * runoff
                                # minus what the column's temperate excess
                                # supplied (round 5; that part is real
                                # booked energy riding enth_runoff)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IceSheetState:
    """(ny, nx) lattice arrays; thickness H in m ice equivalent."""

    H: jnp.ndarray          # ice thickness [m]
    bed: jnp.ndarray        # bedrock elevation [m]
    t: jnp.ndarray          # model time [s], scalar
    #: column internal energy [J m-2] relative to ice at T_MELT (negative =
    #: cold content); the single-layer enthalpy state the energy budget
    #: evolves (PISM enthalpy column analog [U IceCoupler_PISM pism_in])
    enth: jnp.ndarray = None

    def tree_flatten(self):
        return ((self.H, self.bed, self.t, self.enth), ())

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    def __post_init__(self):
        if self.enth is None:
            self.enth = default_enthalpy(self.H)

    @property
    def surface(self) -> jnp.ndarray:
        return self.bed + self.H

    def specific_enthalpy(self) -> jnp.ndarray:
        """h = U / (rho H) [J kg-1]; 0 where ice-free."""
        return jnp.where(self.H > 0, self.enth / (RHO_ICE *
                                                  jnp.maximum(self.H, 1e-30)),
                         0.0)

    def elevmask(self, min_thickness: float = 1.0) -> jnp.ndarray:
        """Flat (nI,) surface elevation where iced, NaN elsewhere -- the
        ``elevmaskI`` consumed by RegridMatrices."""
        icy = self.H > min_thickness
        return jnp.where(icy, self.surface, jnp.nan).reshape(-1)

    def mass(self, cell_area: float) -> jnp.ndarray:
        """Total ice mass [kg] (f64 on CPU, f32 on TPU; the ledger upcasts)."""
        return jnp.sum(self.H) * cell_area * RHO_ICE


def default_enthalpy(H, t_init: float = 263.15):
    """Cold column at uniform ``t_init`` [K]: U = rho H c_i (t_init - Tm)."""
    H = jnp.asarray(H)
    return (RHO_ICE * C_ICE * (t_init - T_MELT) * H).astype(H.dtype)


def init_state(cfg: IceSheetConfig, bed=None, H0=None,
               dome_height: float = 3000.0,
               dome_radius_frac: float = 0.7) -> IceSheetState:
    """Default: Vialov-style parabolic dome centered on the lattice."""
    dt_ = jnp.dtype(cfg.dtype)
    if dt_ == jnp.float64 and not jax.config.jax_enable_x64:
        dt_ = jnp.dtype(jnp.float32)
    if bed is None:
        bed = jnp.zeros((cfg.ny, cfg.nx), dt_)
    else:
        bed = jnp.asarray(bed, dt_).reshape(cfg.ny, cfg.nx)
    if H0 is None:
        y, x = jnp.meshgrid(jnp.arange(cfg.ny), jnp.arange(cfg.nx),
                            indexing="ij")
        rx = (x - (cfg.nx - 1) / 2) / (cfg.nx * dome_radius_frac / 2)
        ry = (y - (cfg.ny - 1) / 2) / (cfg.ny * dome_radius_frac / 2)
        r = jnp.sqrt(rx ** 2 + ry ** 2)
        H0 = dome_height * jnp.maximum(0.0, 1.0 - r ** 1.5) ** (3.0 / 8.0)
        H0 = H0.astype(dt_)
    else:
        H0 = jnp.asarray(H0, dt_).reshape(cfg.ny, cfg.nx)
    return IceSheetState(H=H0, bed=bed,
                         t=jnp.zeros((), jnp.float64)
                         if jax.config.jax_enable_x64
                         else jnp.zeros((), jnp.float32),
                         enth=default_enthalpy(H0, cfg.t_init))


def _face_fluxes(Hg, sg, dx, dy):
    """SIA face fluxes on ghosted arrays: qe (ny+2, nx+1) east faces,
    qn (ny+1, nx+2) north faces [m2 s-1 per unit width, toward the LOWER
    index when positive], plus the CFL diffusivity max (ghost-row/column
    exclusions documented in ``sia_flux_div_ghosted``)."""
    He = 0.5 * (Hg[:, 1:] + Hg[:, :-1])
    dsx = (sg[:, 1:] - sg[:, :-1]) / dx
    sy = jnp.gradient(sg, axis=0) / dy
    sye = 0.5 * (sy[:, 1:] + sy[:, :-1])
    De = GAMMA * He ** (GLEN_N + 2) * (dsx ** 2 + sye ** 2) ** ((GLEN_N - 1) / 2)
    qe = De * dsx

    Hn = 0.5 * (Hg[1:, :] + Hg[:-1, :])
    dsy = (sg[1:, :] - sg[:-1, :]) / dy
    sx = jnp.gradient(sg, axis=1) / dx
    sxn = 0.5 * (sx[1:, :] + sx[:-1, :])
    Dn = GAMMA * Hn ** (GLEN_N + 2) * (dsy ** 2 + sxn ** 2) ** ((GLEN_N - 1) / 2)
    qn = Dn * dsy
    Dmax = jnp.maximum(jnp.max(De[1:-1, :]), jnp.max(Dn[:, 1:-1]))
    return qe, qn, Dmax


def _divergence(qe, qn, dx, dy, shape):
    div = jnp.zeros(shape, qe.dtype)
    div = div.at[:, :-1].add(qe / dx)
    div = div.at[:, 1:].add(-qe / dx)
    div = div.at[:-1, :].add(qn / dy)
    div = div.at[1:, :].add(-qn / dy)
    return div[1:-1, 1:-1]


def sia_flux_div_ghosted(Hg, sg, dx, dy):
    """Flux-form SIA divergence on arrays carrying ONE ghost layer on EVERY
    side (edge-replicated at physical boundaries, neighbor rows/cols under
    1-D or 2-D domain decomposition -- ``parallel.halo``).  Returns the
    divergence cropped to the interior plus the max diffusivity for CFL.

    Conservative by construction: interior face fluxes cancel pairwise; the
    edge-replicated ghosts make boundary-face fluxes zero.  One code path
    serves single-device and every sharding, so sharded trajectories are
    bit-equivalent in stencil shape (SURVEY.md section 4).

    CFL exclusions: De's ghost ROWS (their y-cross-gradient is one-sided in
    the padded block) and Dn's ghost COLUMNS (one-sided x-cross-gradient)
    are excluded from Dmax, so every real face contributes its exact global
    value at least once in some shard and pmax(local) == global.
    """
    qe, qn, Dmax = _face_fluxes(Hg, sg, dx, dy)
    return _divergence(qe, qn, dx, dy, Hg.shape), Dmax


def sia_flux_div_energy_ghosted(Hg, sg, Ug, dx, dy):
    """``sia_flux_div_ghosted`` plus donor-cell enthalpy advection: each
    face's mass flux carries the UPWIND cell's specific enthalpy
    h = U/(rho H), so column energy moves with the ice -- flux-form,
    exactly conservative (interior faces cancel; ghost faces are zero
    because the edge-replicated ghosts zero the mass flux).

    Returns (div, divE, Dmax): thickness divergence [m s-1], energy
    divergence [W m-2], CFL diffusivity.
    """
    qe, qn, Dmax = _face_fluxes(Hg, sg, dx, dy)
    hg = jnp.where(Hg > 0, Ug / (RHO_ICE * jnp.maximum(Hg, 1e-30)), 0.0)
    # positive qe adds mass to the LOWER-index (left) cell -> donor is the
    # HIGHER-index side, and vice versa
    he = jnp.where(qe > 0, hg[:, 1:], hg[:, :-1])
    hn = jnp.where(qn > 0, hg[1:, :], hg[:-1, :])
    div = _divergence(qe, qn, dx, dy, Hg.shape)
    divE = _divergence(RHO_ICE * qe * he, RHO_ICE * qn * hn, dx, dy,
                       Hg.shape)
    return div, divE, Dmax


def ablation_ghosted(Hg_pre, H_post, tsurf, cfg: IceSheetConfig, dt_sub):
    """One substep of surface melt + margin calving [m ice removed].

    Hg_pre: (ny+2, nx+2) thickness WITH one ghost layer (pre-substep: the
    same ghosted array the dynamics used, so the sharded path reuses its
    halo exchange) -- used only for ice-front detection.
    H_post: (ny, nx) thickness after dynamics + SMB.
    tsurf: (ny, nx) surface temperature [K].

    Returns (H_new, melt_act, calv_act); both removals are clamped at the
    available thickness so the accounted mass EXACTLY equals the thickness
    change (the conservation ledger books them as returned mass).  One code
    path serves single-device and every sharding (SURVEY.md section 4).
    """
    melt_req = (cfg.ddf / RHO_ICE) * jnp.maximum(
        tsurf - cfg.melt_t0, 0.0).astype(H_post.dtype) * dt_sub
    melt_act = jnp.minimum(melt_req, H_post)
    H1 = H_post - melt_act

    if cfg.calv_thk > 0.0:
        nb_min = jnp.minimum(
            jnp.minimum(Hg_pre[:-2, 1:-1], Hg_pre[2:, 1:-1]),
            jnp.minimum(Hg_pre[1:-1, :-2], Hg_pre[1:-1, 2:]))
        front = (H1 > 0.0) & (nb_min <= 0.0) & (H1 < cfg.calv_thk)
        frac = -jnp.expm1(-dt_sub / cfg.calv_tau).astype(H1.dtype)
        calv_act = jnp.where(front, H1 * frac, 0.0)
        H1 = H1 - calv_act
    else:
        calv_act = jnp.zeros_like(H1)
    return H1, melt_act, calv_act


def apply_ablation_energy(H1, U, melt_act, calv_act):
    """Book the enthalpy riding shed mass, then drain positive (temperate-
    excess) column energy as BASAL melt -- the energy-budget melt flux.

    H1: (ny, nx) thickness AFTER dynamics+SMB clamp, BEFORE removals.
    U: column energy after dynamics + surface/basal energy input.
    melt_act/calv_act: thicknesses ablation_ghosted removed [m].

    Returns (H_out, U_out, basal_act, eU_run, eU_calv, e_clamp, e_lat):
    every energy term is EXACTLY what was deducted from U (the ledger
    books these, so the energy account closes by construction); basal_act
    is the thickness the energy budget melted [m] (its latent energy
    RHO_ICE * L_FUSION * basal_act is derived, not carried); e_lat is the
    part of the surface melt's latent heat the COLUMN supplied (see
    below).
    """
    safe1 = jnp.maximum(H1, 1e-30)
    eU_run = jnp.where(H1 > 0, U * (melt_act / safe1), 0.0)
    U = U - eU_run
    H2 = H1 - melt_act

    # Round 5 (VERDICT r4 weak #5): surface melt's latent heat draws on
    # the COLUMN first -- temperate excess feeds surface melt before
    # anything melts basally, so surface and basal melt share ONE column
    # budget (PISM's surface/energy coupling [U IceCoupler_PISM]).  The
    # clamp at max(U, 0) means a cold column supplies nothing (its cold
    # content is untouched; the remainder stays the implied-PDD
    # atmospheric share, reported by the ``latent_pdd`` ledger row).  The
    # supplied energy leaves with the runoff water, so it rides eU_run
    # and the energy closure is untouched.
    e_lat = jnp.minimum(jnp.maximum(U, 0.0), RHO_ICE * L_FUSION * melt_act)
    U = U - e_lat
    eU_run = eU_run + e_lat
    safe2 = jnp.maximum(H2, 1e-30)
    eU_calv = jnp.where(H2 > 0, U * (calv_act / safe2), 0.0)
    U = U - eU_calv
    H3 = H2 - calv_act

    # basal/temperate-excess melt: positive column energy converts ice to
    # meltwater at the base; the latent energy leaves with the water
    basal_act = jnp.minimum(jnp.maximum(U, 0.0) / (RHO_ICE * L_FUSION), H3)
    U = U - RHO_ICE * L_FUSION * basal_act
    H4 = H3 - basal_act

    # zero-thickness clamp: an ice-free cell stores no enthalpy; whatever
    # U remains there (leftover excess, discarded cold content) is booked
    e_clamp = jnp.where(H4 > 0, 0.0, U)
    U = jnp.where(H4 > 0, U, 0.0)
    return H4, U, basal_act, eU_run, eU_calv, e_clamp, e_lat


def step(cfg: IceSheetConfig, state: IceSheetState, smb_flux,
         dt: float) -> IceSheetState:
    """Advance one coupling interval ``dt`` [s].

    smb_flux: (ny*nx,) or (ny, nx) surface mass balance [kg m-2 s-1]
    (ice gain positive).  Internally substeps at the diffusive CFL limit
    using a ``lax.while_loop`` bounded by ``n_substeps_max`` (jit-friendly;
    exits as soon as the interval is integrated).
    """
    new_state, _ = step_coupled(cfg, state, smb_flux, None, dt)
    return new_state


def step_coupled(cfg: IceSheetConfig, state: IceSheetState, smb_flux,
                 tsurf, dt: float, enth_flux=None):
    """``step`` plus BOTH halves of the coupled budget.

    smb_flux: (nI,) or (ny, nx) surface mass balance [kg m-2 s-1].
    tsurf: surface temperature [K] driving PDD melt, or None to skip
    ablation statically (the legacy ``step`` path: bit-identical
    trajectories to the melt-free model).
    enth_flux: net column energy input [W m-2] (surface enthalpy + heat
    fluxes + basal geothermal, as delivered by the contract), or None for
    a pure-mass run (the enthalpy state still advects but receives no
    input).

    Returns (state, IceFluxes): per-cell interval-mean fluxes whose mass
    AND energy totals exactly match the state changes net of dynamics
    (the coupler ledger asserts both closures per step).
    """
    smb = (jnp.asarray(smb_flux).reshape(cfg.ny, cfg.nx) / RHO_ICE
           ).astype(state.H.dtype)  # m/s ice equivalent
    ts = None if tsurf is None else (
        jnp.asarray(tsurf).reshape(cfg.ny, cfg.nx).astype(state.H.dtype))
    ef = None if enth_flux is None else (
        jnp.asarray(enth_flux).reshape(cfg.ny, cfg.nx)
        .astype(state.H.dtype))

    def pad(a):
        a = jnp.concatenate([a[:1], a, a[-1:]], axis=0)
        return jnp.concatenate([a[:, :1], a, a[:, -1:]], axis=1)

    bedg = pad(state.bed)          # loop-invariant: hoisted from the scan

    def substep(carry):
        # carry: 5 per-cell flux cums (contract rows) + 2 SCALAR clamp
        # books -- ledger-only quantities summed per substep instead of
        # carried as fields
        H, U, t_done, cums, clamp_s, eclamp_s, it = carry
        Hg = pad(H)
        sg = bedg + Hg
        Ug = pad(U)
        div, divE, Dmax = sia_flux_div_energy_ghosted(Hg, sg, Ug,
                                                      cfg.dx, cfg.dy)
        # diffusive CFL: dt < min(dx,dy)^2 / (4 Dmax)
        cfl = jnp.where(Dmax > 0,
                        0.25 * min(cfg.dx, cfg.dy) ** 2 / (Dmax + 1e-30),
                        cfg.dt_max)
        dt_sub = jnp.minimum(jnp.minimum(cfl, cfg.dt_max), dt - t_done)
        dt_sub = jnp.maximum(dt_sub, 0.0)
        # SMB applied per substep; negative SMB cannot remove more ice than
        # present (mass-conserving clamp: the unfulfilled melt is dropped on
        # the ice side and accounted by the coupler ledger as 'unmelted').
        H_dyn = H + (div + smb) * dt_sub
        H_new = jnp.maximum(H_dyn, 0.0)
        clamp_s = clamp_s + jnp.sum(H_new - H_dyn)   # clamp-fabricated mass
        U_new = U + divE * dt_sub
        if ef is not None:
            U_new = U_new + ef * dt_sub
        if ts is not None:
            H_new, melt, calv = ablation_ghosted(Hg, H_new, ts, cfg, dt_sub)
            H_pre = H_new + melt + calv   # thickness the removals came from
            (H_new, U_new, basal, eU_run, eU_calv,
             e_clamp, e_lat) = apply_ablation_energy(H_pre, U_new, melt,
                                                     calv)
            cums = [c + d for c, d in zip(cums, (
                melt, basal, calv, eU_run, eU_calv, e_lat))]
        else:
            e_clamp = jnp.where(H_new > 0, 0.0, U_new)
            U_new = jnp.where(H_new > 0, U_new, 0.0)
        eclamp_s = eclamp_s + jnp.sum(e_clamp)
        return (H_new, U_new, t_done + dt_sub, cums, clamp_s,
                eclamp_s, it + 1)

    z = jnp.zeros_like(state.H)
    zs = jnp.zeros((), state.H.dtype)
    # while_loop, not a static-length scan: the CFL usually finishes in
    # far fewer than n_substeps_max substeps, and a zero-dt substep is an
    # exact no-op, so early exit is bit-identical and saves the wasted
    # full-stencil passes (the dominant coupling-step cost at toy sizes)
    (H, U, t_done, cums, clamp_s, eclamp_s, _it) = jax.lax.while_loop(
        lambda c: (c[2] < dt) & (c[6] < cfg.n_substeps_max),
        substep,
        (state.H, state.enth, jnp.zeros((), state.H.dtype), [z] * 6, zs,
         zs, jnp.zeros((), jnp.int32)))
    new_state = IceSheetState(H=H, bed=state.bed, t=state.t + dt, enth=U)
    melt_c, basal_c, calv_c, er_c, ec_c, elat_c = cums
    fluxes = IceFluxes(
        runoff=melt_c * (RHO_ICE / dt),
        basal_melt=basal_c * (RHO_ICE / dt),
        calving=calv_c * (RHO_ICE / dt),
        mass_clamp=clamp_s * (RHO_ICE / dt),      # scalar total
        enth_runoff=er_c / dt,
        enth_basal=basal_c * (RHO_ICE * L_FUSION / dt),   # derived
        enth_calving=ec_c / dt,
        enth_clamp=eclamp_s / dt,                 # scalar total
        # the IMPLIED (atmospheric) share only: whatever latent heat the
        # column's temperate excess supplied is real booked energy (it
        # rides enth_runoff), not an implication
        latent_pdd=(melt_c * (RHO_ICE * L_FUSION) - elat_c) / dt)
    return new_state, fluxes
