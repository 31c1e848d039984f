"""`run`: standalone coupled-run driver from a RunConfig JSON.

Reference parity: IceBin is normally driven by ModelE, but ships standalone
test drivers that exercise the coupling loop without a GCM (SURVEY.md
section 1 L4 "standalone test drivers").  This CLI is that driver: build or
load the regridder, run N coupling steps of the SIA (or DISMAL) ice model
under synthetic or file-based forcing, dump per-step fields, checkpoint,
and report the conservation ledger.

    python -m icebin_tpu.cli.run run.json [--forcing synthetic|zero]
        [--ice sia|dismal] [--resume ck.npz] [--fused] [--mesh N]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="icebin-run", description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--forcing", default="synthetic",
                    choices=["synthetic", "zero"])
    ap.add_argument("--ice", default="sia", choices=["sia", "dismal"])
    ap.add_argument("--resume", help="checkpoint to resume from")
    ap.add_argument("--smb", type=float, default=1e-5,
                    help="synthetic SMB magnitude [kg m-2 s-1]")
    ap.add_argument("--fused", action="store_true",
                    help="scan each regeneration window in ONE device "
                         "dispatch (checkpoint cadence then follows regen "
                         "windows; requires a jittable ice model)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="decompose the ice domain over an N-device mesh "
                         "(sharded Pallas applies + halo-ring ice step)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from icebin_tpu.coupler.checkpoint import load_checkpoint, save_checkpoint
    from icebin_tpu.coupler.coupler import CouplerConfig, GCMCoupler
    from icebin_tpu.coupler.writer import CouplerWriter
    from icebin_tpu.io.ncio import read_exchange, read_grid
    from icebin_tpu.regrid.gcmregridder import GCMRegridder
    from icebin_tpu.utils.config import RunConfig

    cfg = RunConfig.from_json(args.config)
    gr = GCMRegridder(read_grid(cfg.gridA_file), hcdefs=cfg.hcdefs)
    for s in cfg.sheets:
        xg = read_exchange(s.exchange_file) if s.exchange_file else None
        gr.add_sheet(s.name, read_grid(s.grid_file), exchange=xg,
                     subdiv=s.subdiv, engine=s.engine)
    writer = (CouplerWriter(cfg.dump_dir) if cfg.dump_dir else None)
    mesh = None
    if args.mesh:
        from icebin_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    cp = GCMCoupler(gr, CouplerConfig(
        dt=cfg.dt_seconds, regen_every=cfg.regen_every,
        min_thickness=cfg.min_thickness, params=cfg.regrid_params()),
        writer=writer, mesh=mesh)
    if args.ice == "dismal":
        from icebin_tpu.models.dismal import DismalModel
        for sc in cp.sheets.values():
            sc.ice_step = DismalModel().step
    if args.resume:
        load_checkpoint(args.resume, cp)
        print(f"resumed at t={cp.time:.6g}s "
              f"({len(cp.ledger.to_rows())} steps done)")

    rng = np.random.default_rng(0)

    def forcing(t, sheet):
        f = np.zeros((8, gr.nE))
        if args.forcing == "synthetic":
            f[0] = args.smb * rng.uniform(0.5, 1.0, gr.nE)
            f[4] = -10.0
        return jnp.asarray(f, jnp.float32)

    if args.fused:
        done = 0
        while done < cfg.n_steps:
            k = min(cfg.checkpoint_every or cfg.n_steps, cfg.n_steps - done)
            cp.run_transient(forcing, k, fused=True)
            done += k
            if cfg.checkpoint_every:
                save_checkpoint(
                    f"checkpoint_{len(cp.ledger.to_rows()):06d}.npz", cp)
    else:
        for k in range(cfg.n_steps):
            cp.couple({name: forcing(cp.time, name) for name in cp.sheets})
            if cfg.checkpoint_every and (k + 1) % cfg.checkpoint_every == 0:
                save_checkpoint(
                    f"checkpoint_{len(cp.ledger.to_rows()):06d}.npz", cp)
    rows = cp.ledger.to_rows()
    for name in cp.sheets:
        worst = max(abs(r[f"{name}.mass_in_E"] - r[f"{name}.mass_delivered_I"])
                    / max(abs(r[f"{name}.mass_in_E"]), 1e-300) for r in rows)
        print(f"{name}: {cfg.n_steps} steps, ice mass "
              f"{rows[-1][f'{name}.ice_mass']:.6e} kg, worst per-step "
              f"transport conservation {worst:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
