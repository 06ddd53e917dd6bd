"""HUD panel, stats overlay, mouse dispatch, and per-pixel aggregation
(reference: src/presentation_manager.cpp:154-323, src/event_manager.cpp:52-136,
include/renderer_types.hpp:34-73)."""
import jax.numpy as jnp
import numpy as np

from lpe_tpu.core import constants as C
from lpe_tpu.core.constants import SimulationType as ST
from lpe_tpu.render.hud import (BTN_DEBUG, BTN_PAUSE_PLAY, BTN_SPEED_0_5,
                                BTN_SPEED_1, PANEL_W, dispatch_button,
                                encode, hit_test, layout_buttons, make_hud,
                                make_stats_overlay)

NAMES = tuple(C.get_scenario_name(s) for s in C.get_all_scenarios())


def _panel(paused=False, ts=1.0, scheme=0, debug=False, scen=0, hl=0):
    hud = make_hud(NAMES)
    return np.asarray(hud(jnp.asarray(paused), jnp.float32(ts),
                          jnp.int32(scheme), jnp.asarray(debug),
                          jnp.int32(scen), jnp.int32(hl)))


def test_hud_panel_layout_and_state_colors():
    f = _panel()
    assert f.shape == (600, PANEL_W, 3) and f.dtype == np.uint8
    # pause button fill: gray 100 base (presentation_manager.cpp:203)
    assert tuple(f[12, 62]) == (100, 100, 100)
    # outline white 1 px (ui_renderer.cpp:21-22)
    assert tuple(f[10, 40]) == (255, 255, 255)
    # speed 1x active -> green 0/200/0 (presentation_manager.cpp:252)
    assert tuple(f[165, 50]) == (0, 200, 0)
    # speed 0.5x inactive -> gray
    assert tuple(f[140, 50]) == (100, 100, 100)
    # scenario 0 active -> green
    assert tuple(f[425, 100]) == (0, 200, 0)
    # label text renders white somewhere inside the pause button
    assert (f[13:20, 15:45] == 255).all(-1).any()

    # hover highlight -> yellow 200/200/0 (presentation_manager.cpp:202)
    fh = _panel(hl=BTN_PAUSE_PLAY)
    assert tuple(fh[12, 62]) == (200, 200, 0)
    # speed selection moves the green
    f05 = _panel(ts=0.5)
    assert tuple(f05[140, 50]) == (0, 200, 0)
    assert tuple(f05[165, 50]) == (100, 100, 100)
    # debug toggle flips fill + label (Debug: ON green)
    fd = _panel(debug=True)
    assert tuple(fd[355, 95]) == (0, 200, 0)
    # paused flips the Pause/Play label and brightens Next Frame
    fp = _panel(paused=True)
    assert tuple(fp[40, 75]) == (100, 100, 100)    # Next Frame active fill
    assert tuple(f[40, 75]) == (50, 50, 50)        # ... dim when running
    assert not (fp[13:20, 15:45] == f[13:20, 15:45]).all()


def test_hud_stats_overlay():
    ov = make_stats_overlay()
    img = jnp.zeros((600, 600, 3), jnp.uint8)
    out = np.asarray(ov(img, jnp.float32(60.0), jnp.float32(120.0),
                        jnp.float32(1.0)))
    assert out.shape == (600, 600, 3)
    # three text lines at (10, 10/25/40), white (renderStatsInternal)
    assert (out[10:17] == 255).all(-1).any()
    assert (out[25:32] == 255).all(-1).any()
    assert (out[40:47] == 255).all(-1).any()
    assert not (out[60:] > 0).any()                # nothing below the block
    # different numbers -> different pixels
    out2 = np.asarray(ov(img, jnp.float32(7.5), jnp.float32(120.0),
                         jnp.float32(1.0)))
    assert not np.array_equal(out, out2)


def test_hud_mouse_dispatch():
    """Mouse hit-test + ButtonID dispatch (event_manager.cpp:52-106)."""
    from lpe_tpu.app.sim_manager import SimManager
    btns = layout_buttons(NAMES)
    assert hit_test(btns, 15, 15).id == BTN_PAUSE_PLAY
    assert hit_test(btns, 15, 140).id == BTN_SPEED_0_5
    assert hit_test(btns, 15, 165).id == BTN_SPEED_1
    assert hit_test(btns, 15, 355).id == BTN_DEBUG
    assert hit_test(btns, 5, 5) is None            # outside every rect
    assert hit_test(btns, 15, 30.5) is None        # between buttons

    m = SimManager(ST.RANDOM_POLYGONS, seed=0)
    assert dispatch_button(m, hit_test(btns, 15, 15)) == "paused"
    assert m.paused
    assert dispatch_button(m, hit_test(btns, 15, 140)) == "speed=0.5x"
    assert float(m.state.time_scale) == 0.5
    assert dispatch_button(m, hit_test(btns, 15, 355)) == "debug=on"
    assert m.debug


def test_render_frame_with_ui():
    from lpe_tpu.app.sim_manager import SimManager
    m = SimManager(ST.RANDOM_POLYGONS, seed=0)
    f = m.render_frame_with_ui()
    assert f.shape == (600, 600 + PANEL_W, 3)
    # panel occupies the right-hand strip; sim frame the left
    assert tuple(f[12, 600 + 62]) == (100, 100, 100)
    # debug mode adds the stats text block in the SIM area (top-left)
    m.toggle_debug()
    m.stats.ticks_per_sec = 120.0
    m.stats.frames_per_sec = 60.0
    fd = m.render_frame_with_ui()
    assert not np.array_equal(fd[10:47, :200], f[10:47, :200])


def test_encode_roundtrip():
    ids = encode("Pause", 8)
    assert ids.shape == (8,) and ids.dtype == np.int32
    assert (encode("ABC") != 0).all()
    assert (encode("abc") == encode("ABC")).all()   # case-folded


def test_pixel_aggregation_sleep_and_temperature():
    """Per-pixel aggregation semantics (renderer_types.hpp:34-73,
    solid_renderer.cpp:34-59): entities sharing a center pixel are colored
    from the pixel AGGREGATE — mass-weighted temperature, last-writer
    sleep — not from their own components."""
    from lpe_tpu.core.config import ScenarioSystemConfig
    from lpe_tpu.core.constants import Phase, ShapeKind
    from lpe_tpu.render.frame import (SCHEME_SLEEP, SCHEME_TEMPERATURE,
                                      make_renderer)
    from lpe_tpu.scene import SceneBuilder

    b = SceneBuilder("agg")
    # A and B share the SAME center: A carries temp 100 at 3x the mass of
    # B's temp 0 -> aggregate t = 0.75 -> color (191, 0, 63)
    b.add(pos=(2.0, 2.0), radius=0.4, temperature=100.0, mass=3.0,
          shape_kind=int(ShapeKind.CIRCLE), phase=int(Phase.SOLID))
    b.add(pos=(2.0, 2.0), radius=0.2, temperature=0.0, mass=1.0,
          shape_kind=int(ShapeKind.CIRCLE), phase=int(Phase.SOLID))
    # C alone, no Temperature component -> gray 128
    b.add(pos=(5.0, 5.0), radius=0.3, mass=1.0,
          shape_kind=int(ShapeKind.CIRCLE), phase=int(Phase.SOLID))
    sc = b.finalize(ScenarioSystemConfig())
    r = make_renderer(sc.spec, sc.cfg, color_scheme=SCHEME_TEMPERATURE)
    f = np.asarray(r(sc.state))
    t = 0.75
    agg = (int(255 * t), 0, int(255 * (1 - t)))
    hits = (f == np.array(agg, np.uint8)).all(-1)
    assert hits.any(), "shared-pixel entities must use the aggregate color"
    # B (drawn after A over the same center) shows the SAME aggregate, not
    # its own pure blue
    assert not ((f[:, :, 2] == 255) & (f[:, :, 0] == 0)).any()
    assert (f == 128).all(-1).any()                # C -> gray

    # SLEEP: D has no Sleep component but shares a pixel with asleep E ->
    # both read the aggregate's is_asleep (last writer WITH Sleep) -> red
    b2 = SceneBuilder("agg2")
    b2.add(pos=(2.0, 2.0), radius=0.4, mass=1.0,
           shape_kind=int(ShapeKind.CIRCLE), phase=int(Phase.SOLID))
    b2.add(pos=(2.0, 2.0), radius=0.2, mass=1.0, has_sleep=True,
           asleep=True, shape_kind=int(ShapeKind.CIRCLE),
           phase=int(Phase.SOLID))
    b2.add(pos=(5.0, 5.0), radius=0.3, mass=1.0,
           shape_kind=int(ShapeKind.CIRCLE), phase=int(Phase.SOLID))
    sc2 = b2.finalize(ScenarioSystemConfig())
    r2 = make_renderer(sc2.spec, sc2.cfg, color_scheme=SCHEME_SLEEP)
    f2 = np.asarray(r2(sc2.state))
    red = (f2[:, :, 0] == 200) & (f2[:, :, 1] == 50)
    green = (f2[:, :, 1] == 200) & (f2[:, :, 0] == 50)
    assert red.any(), "sleep aggregate must propagate to non-Sleep sharer"
    assert green.any(), "no-Sleep pixel reads awake -> green"
