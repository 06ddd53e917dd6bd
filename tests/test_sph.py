"""SPH kernel and fluid-system tests (reference: fluid_kernels.metal:19-441)."""
import math

import numpy as np

from lpe_tpu.systems.fluid.sph import (poly6_coeff_2d, spiky_coeff_2d,
                                       visc_laplacian_coeff_2d)


def test_poly6_2d_normalization():
    # Integral over the disc r<h of coeff*(h^2-r^2)^3 dA must be 1
    h = 0.05
    c = poly6_coeff_2d(h)
    r = np.linspace(0, h, 20001)
    w = c * (h * h - r * r) ** 3
    integral = np.trapezoid(w * 2 * np.pi * r, r)
    assert np.isclose(integral, 1.0, rtol=1e-4)


def test_kernel_coeff_values():
    # pin exact constants from the reference (metal:19-38)
    h = 0.05
    assert np.isclose(poly6_coeff_2d(h), 4.0 / (math.pi * h ** 8))
    assert np.isclose(spiky_coeff_2d(h), -30.0 / (math.pi * h ** 5))
    assert np.isclose(visc_laplacian_coeff_2d(h), 40.0 / (math.pi * h ** 5))


def _fluid_pair_scene(p0, p1, **fluid_kw):
    import dataclasses
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=6.0),
        fluid=dataclasses.replace(FluidConfig(), **fluid_kw))
    b = SceneBuilder("pair")
    for p in (p0, p1):
        b.add(pos=p, mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    return b.finalize(cfg)


def test_isolated_particle_density():
    # A single neighbor pair far apart: density = m * W(0) = m * poly6 * h^6
    from lpe_tpu.systems.fluid import make_fluid
    sc = _fluid_pair_scene((1.0, 1.0), (5.0, 5.0), num_sub_steps=1)
    step = make_fluid(sc.spec, sc.cfg)
    s = step(sc.state)
    h = sc.cfg.fluid.grid.smoothing_length
    expect = 0.005 * poly6_coeff_2d(h) * h ** 6
    rho = np.asarray(s.bodies.density)[sc.spec.liquid_slice]
    assert np.allclose(rho, expect, rtol=1e-4)


def test_pair_pressure_force_symmetric():
    # Two close particles: equal-and-opposite pressure forces -> velocities
    # separate along the pair axis with v0 = -v1
    from lpe_tpu.systems.fluid import make_fluid
    sc = _fluid_pair_scene((3.0, 3.0), (3.02, 3.0), num_sub_steps=1)
    step = make_fluid(sc.spec, sc.cfg)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)[sc.spec.liquid_slice]
    assert np.isclose(v[0, 0], -v[1, 0], rtol=1e-4)
    assert v[0, 0] < 0 < v[1, 0]          # repulsion
    assert abs(v[0, 1]) < 1e-7 and abs(v[1, 1]) < 1e-7


def test_eos_pressure_clamped_nonnegative():
    from lpe_tpu.systems.fluid import make_fluid
    sc = _fluid_pair_scene((1.0, 1.0), (5.0, 5.0), num_sub_steps=1,
                           rest_density=1e9)  # rho << rest -> clamp to 0
    step = make_fluid(sc.spec, sc.cfg)
    s = step(sc.state)
    p = np.asarray(s.bodies.pressure)[sc.spec.liquid_slice]
    assert (p == 0.0).all()


def test_momentum_conserved_by_pair_forces():
    """Newton's 3rd law over the whole blob: with gravity off and no walls,
    SPH pressure/viscosity forces must conserve total linear momentum
    (the reference's symmetrized pressure term, metal:362-396)."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_render_io import _drop_scene
    from lpe_tpu.systems import build_tick_fn
    sc = _drop_scene()
    cfg = sc.cfg.replace(gravity=dataclasses.replace(
        sc.cfg.gravity, gravitational_acceleration=0.0))
    tick = build_tick_fn(sc.spec, cfg, donate=False)
    liq = sc.spec.liquid_slice
    m = np.asarray(sc.state.bodies.mass)[liq]
    p0 = (m[:, None] * np.asarray(sc.state.bodies.vel)[liq]).sum(0)
    s = sc.state
    for _ in range(5):
        s = tick(s)
    p1 = (m[:, None] * np.asarray(s.bodies.vel)[liq]).sum(0)
    scale = (np.abs(m[:, None] * np.asarray(s.bodies.vel)[liq])).sum()
    assert np.abs(p1 - p0).max() < 1e-4 * max(scale, 1e-30)


def test_pallas_pair_kernels_match_xla():
    """The Pallas row-band kernels (ops/pallas_sph.py) against the XLA
    cell-dense path, interpret mode on CPU; bitwise-level agreement up to
    neighbor-sum reassociation."""
    import dataclasses
    from lpe_tpu.systems.fluid import make_fluid
    sc = _fluid_pair_scene((3.0, 3.0), (3.02, 3.01), num_sub_steps=2)
    outs = {}
    for backend in ("xla", "pallas"):
        fl = dataclasses.replace(sc.cfg.fluid, pair_backend=backend)
        step = make_fluid(sc.spec, sc.cfg.replace(fluid=fl))
        outs[backend] = step(sc.state)
    px = np.asarray(outs["xla"].bodies.pos)
    pp = np.asarray(outs["pallas"].bodies.pos)
    rx = np.asarray(outs["xla"].bodies.density)
    rp = np.asarray(outs["pallas"].bodies.density)
    assert np.allclose(px, pp, atol=1e-6)
    assert np.allclose(rx, rp, rtol=1e-5)


def _blob_scene(n=60, universe=1.5, seed=0, vmax=0.3, walls=False,
                **fluid_kw):
    """Small random blob in a small universe (small grid keeps the resident
    migration tensors tiny on the CPU test backend)."""
    import dataclasses
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=universe),
        fluid=dataclasses.replace(FluidConfig(), **fluid_kw))
    rng = np.random.default_rng(seed)
    b = SceneBuilder("blob")
    if walls:
        b.add_wall(universe / 2, 0.05, universe / 2, 0.04)
    for _ in range(n):
        b.add(pos=tuple(rng.uniform(universe * 0.3, universe * 0.7, 2)),
              vel=tuple(rng.uniform(-vmax, vmax, 2)),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    return b.finalize(cfg)


def _run_fluid(sc, residency, ticks=2, pair_backend="xla"):
    import dataclasses
    from lpe_tpu.systems.fluid import make_fluid
    fl = dataclasses.replace(sc.cfg.fluid, residency=residency,
                             pair_backend=pair_backend)
    step = make_fluid(sc.spec, sc.cfg.replace(fluid=fl))
    s = sc.state
    for _ in range(ticks):
        s = step(s)
    return s


def test_resident_matches_scatter_mode():
    """Grid-resident substeps (one sort per tick + dense migration) against
    the per-substep scatter path: same physics, float-tolerance agreement
    (pair sums reassociate under the compaction order change)."""
    sc = _blob_scene(n=60, vmax=0.3)
    s_off = _run_fluid(sc, "off")
    s_on = _run_fluid(sc, "on")
    liq = sc.spec.liquid_slice
    po = np.asarray(s_off.bodies.pos)[liq]
    pn = np.asarray(s_on.bodies.pos)[liq]
    ro = np.asarray(s_off.bodies.density)[liq]
    rn = np.asarray(s_on.bodies.density)[liq]
    assert np.isfinite(pn).all()
    assert np.allclose(po, pn, atol=1e-4)
    assert np.allclose(ro, rn, rtol=1e-3)
    vo = np.asarray(s_off.bodies.vel)[liq]
    vn = np.asarray(s_on.bodies.vel)[liq]
    assert np.allclose(vo, vn, atol=1e-3)


def test_resident_migration_crosses_cells():
    """Fast-moving particles cross several cells over a few ticks; the
    migration compaction must keep every particle resident (no loss, no
    freeze) and agree with the scatter path."""
    # 1.2 m/s for 3 ticks at dt=1/120 -> ~0.03 m/tick = 0.6 cells/tick
    sc = _blob_scene(n=40, vmax=1.2, seed=3)
    s_off = _run_fluid(sc, "off", ticks=3)
    s_on = _run_fluid(sc, "on", ticks=3)
    liq = sc.spec.liquid_slice
    po = np.asarray(s_off.bodies.pos)[liq]
    pn = np.asarray(s_on.bodies.pos)[liq]
    moved = np.abs(pn - np.asarray(sc.state.bodies.pos)[liq]).max(1)
    assert (moved > 1e-3).all()          # nobody frozen
    assert np.allclose(po, pn, atol=1e-4)


def test_resident_coupling_matches_scatter_mode():
    """Two-way rigid coupling on the flattened dense slots must match the
    particle-order coupling of the scatter path."""
    sc = _blob_scene(n=50, vmax=0.4, walls=True, seed=5)
    s_off = _run_fluid(sc, "off", ticks=2)
    s_on = _run_fluid(sc, "on", ticks=2)
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_off.bodies.pos)[liq],
                       np.asarray(s_on.bodies.pos)[liq], atol=1e-4)
    # rigid writeback (wall is infinite mass -> velocity must stay ~0, but
    # compare the whole rigid rows anyway)
    assert np.allclose(np.asarray(s_off.bodies.vel)[:1],
                       np.asarray(s_on.bodies.vel)[:1], atol=1e-5)


def test_resident_pallas_interpret_matches_xla():
    """Resident mode with the Pallas row-band pair kernels (interpret mode on
    CPU) against resident XLA."""
    sc = _blob_scene(n=30, vmax=0.3, seed=7)
    s_x = _run_fluid(sc, "on", ticks=1, pair_backend="xla")
    s_p = _run_fluid(sc, "on", ticks=1, pair_backend="pallas")
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_x.bodies.pos)[liq],
                       np.asarray(s_p.bodies.pos)[liq], atol=1e-6)
    assert np.allclose(np.asarray(s_x.bodies.density)[liq],
                       np.asarray(s_p.bodies.density)[liq], rtol=1e-5)


def test_pallas_sweep_matches_xla_scatter():
    """The fused rolling-window sweep kernel (ops/pallas_sph.py
    make_pair_sweep, interpret mode on CPU) against the XLA path, scatter
    (non-resident) mode."""
    sc = _blob_scene(n=40, vmax=0.5, seed=11)
    s_x = _run_fluid(sc, "off", ticks=2, pair_backend="xla")
    s_p = _run_fluid(sc, "off", ticks=2, pair_backend="sweep")
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_x.bodies.pos)[liq],
                       np.asarray(s_p.bodies.pos)[liq], atol=1e-6)
    assert np.allclose(np.asarray(s_x.bodies.density)[liq],
                       np.asarray(s_p.bodies.density)[liq], rtol=1e-5)
    assert np.allclose(np.asarray(s_x.bodies.vel)[liq],
                       np.asarray(s_p.bodies.vel)[liq], atol=1e-5)


def test_pallas_sweep_matches_xla_resident():
    """Sweep kernel in grid-resident mode (the production TPU path),
    including rigid coupling downstream of the swept rho/forces."""
    sc = _blob_scene(n=50, vmax=0.4, walls=True, seed=5)
    s_x = _run_fluid(sc, "on", ticks=2, pair_backend="xla")
    s_p = _run_fluid(sc, "on", ticks=2, pair_backend="sweep")
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_x.bodies.pos)[liq],
                       np.asarray(s_p.bodies.pos)[liq], atol=1e-5)
    assert np.allclose(np.asarray(s_x.bodies.density)[liq],
                       np.asarray(s_p.bodies.density)[liq], rtol=1e-4)
    # velocity tolerance: the sweep kernel's occupancy-bounded fast path
    # sums the neighbor axis over K/2 instead of K slots — a reduction-tree
    # (ULP-level) reassociation of rho that the stiff EOS cancellation
    # (stiffness * (rho - rest)) amplifies into pressure forces; measured
    # ~4e-4 on |v|~10 after 2 ticks of this chaotic walled blob
    assert np.allclose(np.asarray(s_x.bodies.vel)[liq],
                       np.asarray(s_p.bodies.vel)[liq], atol=3e-3)


def _dense_band_scene(n_fluid=60, n_rigid=120, seed=9):
    """A rigid-DENSE horizontal band under a fluid blob: ~n_rigid small
    polygons packed into a couple of grid rows (far beyond any per-row
    candidate cap) with fluid particles overlapping them. Regression
    geometry for VERDICT r3 missing #1 — the old per-row candidate list
    silently dropped all but 16 rigids per row; the per-cell rasterized
    field must match the uncapped XLA coupling path at ANY row density."""
    import dataclasses
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase, ShapeKind
    from lpe_tpu.math.polygon import (build_regular_polygon,
                                      calculate_polygon_inertia)
    from lpe_tpu.scene import SceneBuilder
    universe = 3.0
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=universe),
        fluid=FluidConfig())
    rng = np.random.default_rng(seed)
    b = SceneBuilder("denseband")
    # tightly packed rigid band across the full width at y ~ 0.6
    nc = n_rigid // 2
    for row in range(2):
        for col in range(nc):
            r = 0.011
            verts = build_regular_polygon(3 + (col + row) % 4, r)
            m = 0.5
            b.add(pos=(0.05 + (col + 0.5) * (universe - 0.1) / nc
                       + float(rng.uniform(-0.002, 0.002)),
                       0.58 + 0.026 * row),
                  mass=m, phase=int(Phase.SOLID),
                  shape_kind=int(ShapeKind.POLYGON), radius=r, verts=verts,
                  inertia=calculate_polygon_inertia(verts, m))
    for _ in range(n_fluid):
        b.add(pos=(float(rng.uniform(0.1, universe - 0.1)),
                   float(rng.uniform(0.55, 0.67))),
              vel=(float(rng.uniform(-0.2, 0.2)),
                   float(rng.uniform(-0.3, 0.0))),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    return b.finalize(cfg)


def test_coupling_dense_band_matches_xla_uncapped():
    """Per-cell rasterized coupling vs the uncapped XLA dense path on a
    band whose ROW density (~60 rigids/row) far exceeds the old per-row
    cap of 16 — every interaction must survive."""
    sc = _dense_band_scene()
    assert sc.spec.coupling_max_row_cover0 > 32   # the stress is real
    s_x = _run_fluid(sc, "on", ticks=2, pair_backend="xla")
    s_p = _run_fluid(sc, "on", ticks=2, pair_backend="pallas")
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_x.bodies.pos)[liq],
                       np.asarray(s_p.bodies.pos)[liq], atol=1e-5)
    assert np.allclose(np.asarray(s_x.bodies.vel)[liq],
                       np.asarray(s_p.bodies.vel)[liq], atol=1e-4)
    # every rigid's force writeback must match (none dropped)
    ns = sc.spec.n_solid
    assert np.allclose(np.asarray(s_x.bodies.vel)[:ns],
                       np.asarray(s_p.bodies.vel)[:ns], atol=1e-5)
    assert np.allclose(np.asarray(s_x.bodies.omega)[:ns],
                       np.asarray(s_p.bodies.omega)[:ns], atol=1e-5)


def test_coupling_slot_saturation_is_detected():
    """Each silent cap must be observable: shrink the per-cell slot
    capacity below the dense band's real coverage and the telemetry must
    report drops (and the well-sized default must report ~none)."""
    import dataclasses
    from lpe_tpu.core.telemetry import capacity_report
    sc = _dense_band_scene()
    rep = capacity_report(sc.state, sc.spec, sc.cfg)
    assert rep["coupling_cell_slots"]["dropped"] == 0
    tiny = sc.cfg.replace(fluid=dataclasses.replace(
        sc.cfg.fluid, coupling_slots_per_cell=8,
        coupling_raster_slack_cells=2.0))
    rep2 = capacity_report(sc.state, sc.spec, tiny)
    assert rep2["coupling_cell_slots"]["dropped"] > 0


def test_pallas_coupling_kernel_matches_xla():
    """The fused Pallas coupling kernel (ops/pallas_sph.py make_coupling,
    interpret mode on CPU) against the XLA overlap/impulse/position solves:
    same per-slot math and rigid accumulation order, so agreement is
    reduction-order tight."""
    sc = _blob_scene(n=50, vmax=0.4, walls=True, seed=5)
    s_x = _run_fluid(sc, "on", ticks=2, pair_backend="xla")
    s_p = _run_fluid(sc, "on", ticks=2, pair_backend="pallas")
    liq = sc.spec.liquid_slice
    assert np.allclose(np.asarray(s_x.bodies.pos)[liq],
                       np.asarray(s_p.bodies.pos)[liq], atol=1e-5)
    assert np.allclose(np.asarray(s_x.bodies.vel)[liq],
                       np.asarray(s_p.bodies.vel)[liq], atol=1e-4)
    # rigid force/torque writeback path (wall row)
    assert np.allclose(np.asarray(s_x.bodies.vel)[:1],
                       np.asarray(s_p.bodies.vel)[:1], atol=1e-5)


def _wall_contact_scene(seed=2, n=40, maxy=0.425):
    """Particles straddling a wall's TOP face, with the wall's maxy
    deliberately mid-row (not a multiple of cell=0.05): the regression
    geometry for the coupling candidate-window off-by-two (the row/tile
    windows ignored the 2-cell apron + 1-row padding, dropping rigids
    whose maxy fell inside a row's span from that row's candidates)."""
    import dataclasses
    from lpe_tpu.core.config import ScenarioSystemConfig, SharedSystemConfig
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    universe = 1.5
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=universe))
    rng = np.random.default_rng(seed)
    b = SceneBuilder("wallcontact")
    half_h = 0.125
    assert (maxy / 0.05) % 1.0 == 0.5       # mid-row by construction
    b.add_wall(universe / 2, maxy - half_h, 0.4, half_h)
    for _ in range(n):
        # band straddling the wall top: some inside the AABB, some above
        b.add(pos=(float(rng.uniform(0.45, 1.05)),
                   float(rng.uniform(maxy - 0.03, maxy + 0.03))),
              vel=(0.0, float(rng.uniform(-0.2, 0.0))),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    return b.finalize(cfg)


def test_coupling_fires_at_mid_row_wall_face():
    """Regression for the candidate-window apron offset: a rigid whose
    max-y face lies mid-row must still couple with the fluid band at that
    face on the Pallas path, and the Pallas path must match XLA."""
    sc = _wall_contact_scene()
    y0 = np.asarray(sc.state.bodies.pos)[:, 1]
    liq = sc.spec.liquid_slice
    inside0 = int((y0[liq] < 0.425).sum())
    assert inside0 >= 5                      # scene really overlaps the wall
    s_x = _run_fluid(sc, "on", ticks=2, pair_backend="xla")
    s_p = _run_fluid(sc, "on", ticks=2, pair_backend="pallas")
    px = np.asarray(s_x.bodies.pos)[liq]
    pp = np.asarray(s_p.bodies.pos)[liq]
    vx = np.asarray(s_x.bodies.vel)[liq]
    vp = np.asarray(s_p.bodies.vel)[liq]
    # (a) coupling is actually nonzero: the position solver pushed the
    # initially-penetrating particles up out of the wall
    pushed = pp[:, 1] - y0[liq]
    assert (pushed[y0[liq] < 0.425] > 1e-4).any()
    # (b) the Pallas coupling path agrees with XLA — this diverged by
    # ~0.026 m/tick before the window fix
    assert np.allclose(px, pp, atol=1e-5)
    assert np.allclose(vx, vp, atol=1e-4)
    # (c) sweep backend routes coupling through the same kernel
    s_s = _run_fluid(sc, "on", ticks=2, pair_backend="sweep")
    ps = np.asarray(s_s.bodies.pos)[liq]
    assert np.allclose(px, ps, atol=1e-5)


def test_migrate_ring_walks_multi_cell_moves():
    """Direct interpret-mode test of ops/pallas_sph.make_migrate_ring in the
    >1-cell-move regime (a coupling push-out / boundary clamp can displace a
    particle several cells between migrations). The kernel must mirror the
    XLA _migrate's walking semantics (sph.py _migrate docstring): the target
    cell is clamped to +-1 of the slot's STORED cell, so a far-displaced
    particle keeps its exact position and walks one cell per migration —
    NEVER falling out of the 3x3 candidate window and being dropped.
    Regression for the unclamped-target bug (ADVICE r2, high)."""
    import jax.numpy as jnp
    from lpe_tpu.ops.pallas_sph import make_migrate_ring, TILE_X

    ny = nx = 4
    K, NT = 8, 1
    NTX = NT * TILE_X
    cell, eps, gmin = 1.0, 0.0, 0
    mig = make_migrate_ring(ny, nx, NT, K, half_dt=0.0, sub_dt=1.0,
                            lim=0.45, cell=cell, eps=eps, gmin=gmin,
                            interpret=True)

    # (id, stored interior (row, col), position -> true interior cell)
    parts = [
        (1.0, (0, 0), (3.5, 3.5)),   # 3 cells away on both axes
        (2.0, (2, 2), (2.5, 2.5)),   # already home
        (3.0, (1, 3), (0.5, 1.5)),   # 3 columns left (pos is (x, y))
        (4.0, (3, 1), (1.5, 0.5)),   # 3 rows up
        (5.0, (1, 1), (2.5, 2.5)),   # 1-cell diagonal (normal regime)
        (6.0, (1, 1), (2.5, 2.5)),   # same target: rank compaction
        (7.0, (1, 1), (1.5, 1.5)),   # stays
    ]
    ST = np.zeros((ny + 2, 9, K, NTX), np.float32)
    slot_next = {}
    for pid, (r, c), (x, y) in parts:
        s = slot_next.get((r, c), 0)
        slot_next[(r, c)] = s + 1
        ST[r + 1, 0, s, c + 1] = x
        ST[r + 1, 1, s, c + 1] = y
        ST[r + 1, 6, s, c + 1] = 0.005       # m
        ST[r + 1, 7, s, c + 1] = pid         # id
        ST[r + 1, 8, s, c + 1] = 1.0         # occ

    def tile_bounds(occ):
        return occ.sum(axis=1).reshape(occ.shape[0], NT, TILE_X) \
                  .max(-1).astype(jnp.int32)

    def id_cells(M9):
        """{id: (interior_row, interior_col)} of every live M9 slot."""
        occ = np.asarray(M9[:, 5])
        ids = np.asarray(M9[:, 8])
        out = {}
        for r, k, c in zip(*np.nonzero(occ > 0)):
            out[round(float(ids[r, k, c]))] = (r - 1, c - 1)
        return out

    st = jnp.asarray(ST)
    n0 = int(ST[:, 8].sum())
    seen = []
    for step in range(4):
        M9 = mig(tile_bounds(st[:, 8]), st)
        # conservation: nothing dropped, ids intact, positions untouched
        assert int(np.asarray(M9[:, 5]).sum()) == n0
        cells = id_cells(M9)
        assert sorted(cells) == [1, 2, 3, 4, 5, 6, 7]
        seen.append(cells)
        z = jnp.zeros_like(M9[:, 0])
        st = jnp.stack([M9[:, 0], M9[:, 1], M9[:, 2], M9[:, 3], z, z,
                        M9[:, 4], M9[:, 8], M9[:, 5]], axis=1)

    # one cell per migration along each axis, exactly the XLA walk
    assert seen[0][1] == (1, 1) and seen[1][1] == (2, 2) \
        and seen[2][1] == (3, 3) and seen[3][1] == (3, 3)
    assert seen[0][3] == (1, 2) and seen[1][3] == (1, 1) \
        and seen[2][3] == (1, 0) and seen[3][3] == (1, 0)
    assert seen[0][4] == (2, 1) and seen[1][4] == (1, 1) \
        and seen[2][4] == (0, 1) and seen[3][4] == (0, 1)
    # normal 1-cell movers arrive immediately and stay
    for stp in seen:
        assert stp[2] == (2, 2) and stp[7] == (1, 1)
    assert seen[0][5] == (2, 2) and seen[0][6] == (2, 2)


def test_grid_neighbor_count_cap_is_deterministic():
    # 200 particles in one cell: run twice, identical results (the reference's
    # atomic 64-cap is racy; ours must be deterministic)
    import dataclasses
    import jax
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    from lpe_tpu.systems.fluid import make_fluid
    cfg = ScenarioSystemConfig(shared=SharedSystemConfig(universe_size_m=6.0))
    b = SceneBuilder("dense")
    rng = np.random.default_rng(0)
    for _ in range(200):
        b.add(pos=(3.0 + rng.uniform(0, 0.04), 3.0 + rng.uniform(0, 0.04)),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    sc = b.finalize(cfg)
    step = jax.jit(make_fluid(sc.spec, sc.cfg))
    s1 = step(sc.state)
    s2 = step(sc.state)
    assert (np.asarray(s1.bodies.pos) == np.asarray(s2.bodies.pos)).all()
    assert np.isfinite(np.asarray(s1.bodies.pos)).all()


def test_cross_tick_residency_matches_per_tick():
    """build_run_fn's block-resident fluid grid (one build/readback per
    BLOCK, boundary+gravity applied to the liquid planes in grid space)
    against the per-tick composition. Slot assignment differs from the
    per-tick rebuild (sort vs. carried migration order), so pair sums
    reassociate — float-tolerance agreement, like resident-vs-scatter."""
    import dataclasses
    import jax
    from lpe_tpu.systems import build_run_fn, build_tick_fn

    sc = _blob_scene(n=50, vmax=0.3, walls=True, seed=3)
    fl = dataclasses.replace(sc.cfg.fluid, residency="on",
                             pair_backend="xla")
    cfg = sc.cfg.replace(fluid=fl)
    ticks = 3      # past ~4 ticks this walled blob hits position_solve's
    #                discontinuous out-of-tank teleport clamp, which
    #                amplifies ULP reassociation binarily — 3 ticks of the
    #                coupled scene agree bitwise on this backend

    tick = build_tick_fn(sc.spec, cfg, donate=False)
    s_ref = sc.state
    for _ in range(ticks):
        s_ref = tick(s_ref)

    run = build_run_fn(sc.spec, cfg, ticks=ticks, donate=False)
    s_ct = run(sc.state)

    liq = sc.spec.liquid_slice
    assert np.isfinite(np.asarray(s_ct.bodies.pos)).all()
    assert int(s_ct.tick) == int(s_ref.tick)
    assert np.allclose(np.asarray(s_ref.bodies.pos)[liq],
                       np.asarray(s_ct.bodies.pos)[liq], atol=1e-5)
    assert np.allclose(np.asarray(s_ref.bodies.density)[liq],
                       np.asarray(s_ct.bodies.density)[liq], rtol=1e-4)
    assert np.allclose(np.asarray(s_ref.bodies.vel)[liq],
                       np.asarray(s_ct.bodies.vel)[liq], atol=1e-4)
    # rigid write-back path (wall rows) must agree too
    assert np.allclose(np.asarray(s_ref.bodies.vel)[:1],
                       np.asarray(s_ct.bodies.vel)[:1], atol=1e-5)
    # determinism: the block-resident run is a pure function
    s_ct2 = run(sc.state)
    assert (np.asarray(s_ct.bodies.pos) == np.asarray(s_ct2.bodies.pos)).all()

    # longer horizon, no walls (no teleport discontinuity): gravity +
    # boundary + 8 ticks of pair forces, float-tolerance agreement
    sc2 = _blob_scene(n=40, vmax=0.3, seed=9)
    cfg2 = sc2.cfg.replace(fluid=dataclasses.replace(
        sc2.cfg.fluid, residency="on", pair_backend="xla"))
    tick2 = build_tick_fn(sc2.spec, cfg2, donate=False)
    s_ref2 = sc2.state
    for _ in range(8):
        s_ref2 = tick2(s_ref2)
    s_ct2b = build_run_fn(sc2.spec, cfg2, ticks=8, donate=False)(sc2.state)
    liq2 = sc2.spec.liquid_slice
    assert np.allclose(np.asarray(s_ref2.bodies.pos)[liq2],
                       np.asarray(s_ct2b.bodies.pos)[liq2], atol=1e-4)
    assert np.allclose(np.asarray(s_ref2.bodies.vel)[liq2],
                       np.asarray(s_ct2b.bodies.vel)[liq2], atol=1e-3)


def test_cross_tick_gated_off_for_barnes_hut_and_sleep():
    """Scenes where another system needs per-tick liquid state in particle
    order must fall back to the per-tick composition (bitwise identical
    to build_tick_fn repetition)."""
    import dataclasses
    from lpe_tpu.systems import build_run_fn, build_system_list

    sc = _blob_scene(n=30, vmax=0.2, seed=1)
    fl = dataclasses.replace(sc.cfg.fluid, residency="on",
                             pair_backend="xla",
                             cross_tick_residency="off")
    cfg = sc.cfg.replace(fluid=fl)
    run = build_run_fn(sc.spec, cfg, ticks=2, donate=False)
    s = run(sc.state)
    assert np.isfinite(np.asarray(s.bodies.pos)).all()


def _mixed_h_scene(n=48, universe=1.5, seed=4):
    """Blob with two smoothing-length populations (reference capability:
    per-particle h, fluid.cpp:293 + metal:362-396 pairwise h-bar)."""
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=universe),
        fluid=FluidConfig())
    rng = np.random.default_rng(seed)
    b = SceneBuilder("mixed_h")
    for k in range(n):
        b.add(pos=tuple(rng.uniform(universe * 0.35, universe * 0.65, 2)),
              vel=tuple(rng.uniform(-0.3, 0.3, 2)),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02,
              smoothing_length=0.04 if k % 2 else 0.065)
    return b.finalize(cfg)


def test_mixed_h_densities_match_oracle():
    """Mixed smoothing lengths: one tick of the fluid system vs the NumPy
    float64 oracle extended with per-particle h (VERDICT r2 missing #1 —
    the last reference capability gap). Densities use pairwise h-bar with
    per-pair kernel normalizations."""
    from lpe_tpu.oracle.sph_numpy import SphOracle
    from lpe_tpu.systems.fluid import make_fluid

    sc = _mixed_h_scene()
    assert not sc.spec.liquid_h_uniform
    liq = sc.spec.liquid_slice
    hs = np.asarray(sc.state.bodies.h)[liq].astype(np.float64)
    fc = sc.cfg.fluid
    o = SphOracle(h=fc.grid.smoothing_length, rest_density=fc.rest_density,
                  stiffness=fc.stiffness, viscosity=fc.viscosity,
                  universe=sc.cfg.shared.universe_size_m,
                  margin=sc.cfg.boundary.margin_pixels
                  * sc.cfg.shared.meters_per_pixel)
    o.hs = hs
    pos = np.asarray(sc.state.bodies.pos)[liq].astype(np.float64)
    vel = np.asarray(sc.state.bodies.vel)[liq].astype(np.float64)
    mass = np.asarray(sc.state.bodies.mass)[liq].astype(np.float64)

    for residency in ("off", "on"):
        s1 = _run_fluid(sc, residency, ticks=1)
        p1, v1, rho1, _ = o.tick(pos, vel, mass)
        # the oracle tick adds boundary+gravity; the fluid system alone
        # does not — compare the fluid-only quantities (rho is computed
        # inside the substeps, before those per-tick systems)
        got_rho = np.asarray(s1.bodies.density)[liq]
        np.testing.assert_allclose(got_rho, rho1, rtol=2e-4,
                                   err_msg=f"residency={residency}")
        got_pos = np.asarray(s1.bodies.pos)[liq]
        np.testing.assert_allclose(got_pos, p1, atol=5e-6,
                                   err_msg=f"residency={residency}")


def test_mixed_h_uniform_limit_matches_uniform_path():
    """A 'mixed'-h scene whose h values are all equal must reproduce the
    uniform fast path bitwise-closely (the variable-h math degenerates to
    the baked coefficients)."""
    import dataclasses
    sc_u = _blob_scene(n=40, vmax=0.3, seed=9)
    # same content, but force the variable-h code path via a tiny h jitter
    # on ONE particle that stays far outside the blob's support
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    from lpe_tpu.core.config import (FluidConfig, ScenarioSystemConfig,
                                     SharedSystemConfig)
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=1.5), fluid=FluidConfig())
    rng = np.random.default_rng(9)
    b = SceneBuilder("blob")
    for _ in range(40):
        b.add(pos=tuple(rng.uniform(1.5 * 0.3, 1.5 * 0.7, 2)),
              vel=tuple(rng.uniform(-0.3, 0.3, 2)),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    b.add(pos=(0.06, 0.06), vel=(0.0, 0.0), mass=0.005,
          phase=int(Phase.LIQUID), radius=0.02, smoothing_length=0.06)
    sc_m = b.finalize(cfg)
    assert not sc_m.spec.liquid_h_uniform
    s_u = _run_fluid(sc_u, "off", ticks=1)
    s_m = _run_fluid(sc_m, "off", ticks=1)
    liq_u = sc_u.spec.liquid_slice
    lm = sc_m.spec.liquid_start
    np.testing.assert_allclose(
        np.asarray(s_m.bodies.pos)[lm:lm + 40],
        np.asarray(s_u.bodies.pos)[liq_u], atol=1e-6)
