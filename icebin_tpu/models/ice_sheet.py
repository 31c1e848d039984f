"""JAX ice-sheet model: the PISM stand-in for the coupling runtime.

Reference: ``IceCoupler_PISM`` embeds the full PISM ice-sheet model (PETSc,
MPI) in-process (reference: ``slib/icebin/pism/IceCoupler_PISM.*`` [U];
SURVEY.md section 2).  PISM itself is out of scope; the north star
(BASELINE.json config #4) requires a "PISM-style ice grid" transient loop --
an SMB-driven ice model on the projected lattice whose state evolves so the
coupler's matrix-regeneration, E1vE0 remap, and conservation machinery are
exercised for real.

The model implemented here is a shallow-ice-approximation (SIA) thickness
evolution:

    dH/dt = smb/rho_ice + div( D(H, grad s) * grad s ),   s = bed + H

with D the isothermal SIA diffusivity D = Gamma H^{n+2} |grad s|^{n-1}
(Glen n=3), explicit Euler with a diffusive CFL-limited internal substep.
This is a *real* (if simple) ice dynamics core -- mass is exactly conserved
by construction (flux-form divergence on the lattice; zero-flux at margins),
which is what the coupler's conservation ledger checks end-to-end.

Everything is jit-compatible: state is a pytree of dense lattice arrays,
the step is pure, and the stencil operations are XLA shifts (no gathers),
so the model shards over an ice-domain-decomposed device mesh with halo
exchange via shard_map (``icebin_tpu.parallel``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["IceSheetConfig", "IceSheetState", "init_state", "step",
           "step_coupled", "ablation_ghosted", "sia_flux_div_ghosted",
           "RHO_ICE", "GRAVITY", "L_FUSION"]

RHO_ICE = 910.0        # kg m-3
GRAVITY = 9.81         # m s-2
L_FUSION = 3.34e5      # J kg-1 latent heat of fusion (melt energy books)
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
    n_substeps_max: int = 64  # static bound for lax.scan substepping
    # -- ablation physics (the ice->GCM mass-LOSS half of the coupling
    #    budget; reference: PISM's surface melt + calving harvested as
    #    pism_out basal/calving fluxes [U IceCoupler_PISM]) --
    #: PDD-style degree-day melt factor [kg m-2 s-1 K-1]; default is the
    #: canonical 8 mm w.e. K-1 day-1.  Melt = ddf * max(tsurf - melt_t0, 0)
    #: wherever ice is present, clamped at the available thickness.
    ddf: float = 8.0 / 86400.0
    melt_t0: float = 273.15   # K
    #: margin calving: ice-front cells (an ice-free 4-neighbor) thinner
    #: than calv_thk [m] calve at rate H * (1 - exp(-dt/calv_tau)).
    #: calv_thk = 0 disables calving.
    calv_thk: float = 0.0
    calv_tau: float = 86400.0 * 10.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IceSheetState:
    """(ny, nx) lattice arrays; thickness H in m ice equivalent."""

    H: jnp.ndarray          # ice thickness [m]
    bed: jnp.ndarray        # bedrock elevation [m]
    t: jnp.ndarray          # model time [s], scalar

    def tree_flatten(self):
        return ((self.H, self.bed, self.t), ())

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @property
    def surface(self) -> jnp.ndarray:
        return self.bed + self.H

    def elevmask(self, min_thickness: float = 1.0) -> jnp.ndarray:
        """Flat (nI,) surface elevation where iced, NaN elsewhere -- the
        ``elevmaskI`` consumed by RegridMatrices."""
        icy = self.H > min_thickness
        return jnp.where(icy, self.surface, jnp.nan).reshape(-1)

    def mass(self, cell_area: float) -> jnp.ndarray:
        """Total ice mass [kg] (f64 on CPU, f32 on TPU; the ledger upcasts)."""
        return jnp.sum(self.H) * cell_area * RHO_ICE


def init_state(cfg: IceSheetConfig, bed=None, H0=None,
               dome_height: float = 3000.0,
               dome_radius_frac: float = 0.7) -> IceSheetState:
    """Default: Vialov-style parabolic dome centered on the lattice."""
    if bed is None:
        bed = jnp.zeros((cfg.ny, cfg.nx), jnp.float32)
    else:
        bed = jnp.asarray(bed, jnp.float32).reshape(cfg.ny, cfg.nx)
    if H0 is None:
        y, x = jnp.meshgrid(jnp.arange(cfg.ny), jnp.arange(cfg.nx),
                            indexing="ij")
        rx = (x - (cfg.nx - 1) / 2) / (cfg.nx * dome_radius_frac / 2)
        ry = (y - (cfg.ny - 1) / 2) / (cfg.ny * dome_radius_frac / 2)
        r = jnp.sqrt(rx ** 2 + ry ** 2)
        H0 = dome_height * jnp.maximum(0.0, 1.0 - r ** 1.5) ** (3.0 / 8.0)
        H0 = H0.astype(jnp.float32)
    else:
        H0 = jnp.asarray(H0, jnp.float32).reshape(cfg.ny, cfg.nx)
    return IceSheetState(H=H0, bed=bed, t=jnp.zeros((), jnp.float64)
                         if jax.config.jax_enable_x64 else jnp.zeros((), jnp.float32))


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

    div = jnp.zeros_like(Hg)
    div = div.at[:, :-1].add(qe / dx)
    div = div.at[:, 1:].add(-qe / dx)
    div = div.at[:-1, :].add(qn / dy)
    div = div.at[1:, :].add(-qn / dy)
    Dmax = jnp.maximum(jnp.max(De[1:-1, :]), jnp.max(Dn[:, 1:-1]))
    return div[1:-1, 1:-1], Dmax


def _sia_flux_div(H, s, dx, dy):
    """Single-device wrapper: edge-replicate one ghost layer on all sides,
    then the shared ghosted stencil."""
    def pad(a):
        a = jnp.concatenate([a[:1], a, a[-1:]], axis=0)
        return jnp.concatenate([a[:, :1], a, a[:, -1:]], axis=1)
    return sia_flux_div_ghosted(pad(H), pad(s), dx, dy)


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


def step(cfg: IceSheetConfig, state: IceSheetState, smb_flux,
         dt: float) -> IceSheetState:
    """Advance one coupling interval ``dt`` [s].

    smb_flux: (ny*nx,) or (ny, nx) surface mass balance [kg m-2 s-1]
    (ice gain positive).  Internally substeps at the diffusive CFL limit
    using a static-bound ``lax.scan`` (jit-friendly: no data-dependent trip
    count; excess substeps are masked no-ops).
    """
    new_state, _, _ = step_coupled(cfg, state, smb_flux, None, dt)
    return new_state


def step_coupled(cfg: IceSheetConfig, state: IceSheetState, smb_flux,
                 tsurf, dt: float):
    """``step`` plus the mass-LOSS half of the budget: PDD surface melt
    driven by ``tsurf`` [K] and thickness-threshold margin calving
    (``ablation_ghosted``).  Returns (state, melt_flux, calving_flux) with
    the fluxes as (ny, nx) interval means [kg m-2 s-1, ice leaving
    positive] -- the nonzero ``basal_flux``/``calving_flux`` the output
    contract transports back to the GCM (reference: PISM's pism_out
    basal/calving harvest [U IceCoupler_PISM]; SURVEY.md section 3.3).

    ``tsurf=None`` skips ablation statically (the legacy ``step`` path:
    bit-identical trajectories to the melt-free model).
    """
    smb = (jnp.asarray(smb_flux).reshape(cfg.ny, cfg.nx) / RHO_ICE
           ).astype(state.H.dtype)  # m/s ice equivalent
    ts = None if tsurf is None else (
        jnp.asarray(tsurf).reshape(cfg.ny, cfg.nx).astype(state.H.dtype))

    def pad(a):
        a = jnp.concatenate([a[:1], a, a[-1:]], axis=0)
        return jnp.concatenate([a[:, :1], a, a[:, -1:]], axis=1)

    def substep(carry, _):
        H, t_done, melt_cum, calv_cum = carry
        Hg = pad(H)
        sg = pad(state.bed) + Hg
        div, Dmax = sia_flux_div_ghosted(Hg, sg, cfg.dx, cfg.dy)
        # diffusive CFL: dt < min(dx,dy)^2 / (4 Dmax)
        cfl = jnp.where(Dmax > 0,
                        0.25 * min(cfg.dx, cfg.dy) ** 2 / (Dmax + 1e-30),
                        cfg.dt_max)
        dt_sub = jnp.minimum(jnp.minimum(cfl, cfg.dt_max), dt - t_done)
        dt_sub = jnp.maximum(dt_sub, 0.0)
        # SMB applied per substep; negative SMB cannot remove more ice than
        # present (mass-conserving clamp: the unfulfilled melt is dropped on
        # the ice side and accounted by the coupler ledger as 'unmelted').
        dH = (div + smb) * dt_sub
        H_new = jnp.maximum(H + dH, 0.0)
        if ts is not None:
            H_new, melt, calv = ablation_ghosted(Hg, H_new, ts, cfg, dt_sub)
            melt_cum = melt_cum + melt
            calv_cum = calv_cum + calv
        return (H_new, t_done + dt_sub, melt_cum, calv_cum), None

    z = jnp.zeros_like(state.H)
    (H, t_done, melt_cum, calv_cum), _ = jax.lax.scan(
        substep, (state.H, jnp.zeros((), state.H.dtype), z, z),
        None, length=cfg.n_substeps_max)
    new_state = IceSheetState(H=H, bed=state.bed, t=state.t + dt)
    return new_state, melt_cum * (RHO_ICE / dt), calv_cum * (RHO_ICE / dt)
