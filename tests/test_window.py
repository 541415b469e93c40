"""PygameWindow (the MainWindow role) under SDL's dummy video driver:
present blit/scale, event polling, debounced resize, mouse capture —
the interactive paths that headless runs never touch (VERDICT r1 weak #7).
"""

import os
import time

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")


@pytest.fixture()
def window():
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    from softwarerenderer_tpu.io_host.window import PygameWindow
    w = PygameWindow(320, 240, render_scale=0.5)
    yield w
    w.close()


def test_present_blits_and_scales(window):
    # render size = window × scale (MainWindow.cs:93-96)
    assert window.render_size == (160, 120)
    rgb = np.zeros((120, 160, 3), np.uint8)
    rgb[:, :, 0] = 200
    window.present(rgb)                       # scales 160x120 → 320x240
    px = window._screen.get_at((10, 10))
    assert px[0] > 150 and px[1] < 50


def test_present_runs_overlay(window):
    called = {}

    def overlay(screen, pg):
        called["size"] = screen.get_size()

    window.present(np.zeros((120, 160, 3), np.uint8), overlay=overlay)
    assert called["size"] == (320, 240)


def test_poll_events_and_text(window):
    pg = window._pg
    pg.event.post(pg.event.Event(pg.TEXTINPUT, text="hi"))
    pg.event.post(pg.event.Event(pg.MOUSEBUTTONDOWN, button=1,
                                 pos=(5, 5)))
    inp = window.poll()
    assert inp["chars"] == "hi"
    assert inp["mouse_down"]
    assert not inp["quit"]
    pg.event.post(pg.event.Event(pg.QUIT))
    assert window.poll()["quit"]


def test_resize_debounce(window):
    """VIDEORESIZE applies only after the 0.25 s debounce
    (MainWindow.cs:278-296)."""
    pg = window._pg
    pg.event.post(pg.event.Event(pg.VIDEORESIZE, w=400, h=300))
    window.poll()
    assert (window.width, window.height) == (320, 240)   # not yet
    time.sleep(0.3)
    window.poll()
    assert (window.width, window.height) == (400, 300)
    assert window.render_size == (200, 150)


def test_mouse_capture_toggles_grab(window):
    window.set_mouse_capture(True)
    assert window.mouse_captured
    window.set_mouse_capture(False)
    assert not window.mouse_captured


@pytest.mark.slow
def test_game_loop_on_pygame_backend():
    """The dust2 app drives the REAL pygame window (dummy SDL) end to end:
    frames present, HUD overlay draws, input path exercised."""
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    from softwarerenderer_tpu.apps.dust2 import Dust2Game

    g = Dust2Game(server="127.0.0.1", port=17777, width=160, height=120,
                  render_scale=1.0, headless=False, offline=True, seed=3)
    try:
        from softwarerenderer_tpu.io_host.window import PygameWindow
        assert isinstance(g.window, PygameWindow)
        for _ in range(2):
            g.step(1 / 60.0)
        px = [g.window._screen.get_at((x, 60))[:3] for x in (10, 80, 150)]
        assert any(sum(p) > 30 for p in px)     # something was drawn
    finally:
        g.close()


def test_hud_layout_roundtrip(tmp_path):
    """HUD layout persistence (the reference's DefaultLayout.ini analog,
    Renderer.cs:304-308): save → load restores positions + visibility."""
    from softwarerenderer_tpu.io_host.ui import Hud

    hud = Hud()
    hud.layout.chat_pos = (40, 60)
    hud.layout.show_killfeed = False
    hud.state.show_debug = True
    hud.state.max_chat_lines = 5
    path = str(tmp_path / "layout.json")
    hud.save_layout(path)

    hud2 = Hud()
    assert hud2.load_layout(path)
    assert hud2.layout.chat_pos == (40, 60)
    assert hud2.layout.show_killfeed is False
    assert hud2.state.show_debug is True       # toggle restored
    assert hud2.state.max_chat_lines == 5

    # missing / corrupt files fall back to defaults
    hud3 = Hud()
    assert not hud3.load_layout(str(tmp_path / "absent.json"))
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert not hud3.load_layout(str(bad))
    assert hud3.layout.chat_pos == (16, 16)


class _FakeJoystick:
    """Scriptable stand-in (SDL dummy exposes no real controllers)."""

    def __init__(self, axes, buttons):
        self.axes = list(axes)
        self.buttons = list(buttons)

    def get_numaxes(self):
        return len(self.axes)

    def get_numbuttons(self):
        return len(self.buttons)

    def get_axis(self, i):
        return self.axes[i]

    def get_button(self, i):
        return self.buttons[i]

    def get_instance_id(self):
        return 0


def test_gamepad_absent_is_none(window):
    assert window.poll()["gamepad"] is None


def test_gamepad_xinput_layout_and_deadzone(window):
    # 6-axis XInput-style pad: left stick 0/1, right stick 3/4,
    # right trigger 5.  Axis 1 is SDL down-positive → move y negates.
    window._joystick = _FakeJoystick(
        axes=[0.5, -0.8, 0.0, 0.3, -0.4, 0.9],
        buttons=[1, 0, 0, 0, 0, 0])
    gp = window.poll()["gamepad"]
    assert gp["move"] == (0.5, 0.8)
    assert gp["look"] == (0.3, -0.4)
    assert gp["jump"] and gp["fire"]
    # inside the deadzone → exactly zero
    window._joystick = _FakeJoystick(
        axes=[0.1, -0.05, 0.0, 0.02, -0.1, 0.0],
        buttons=[0, 0, 0, 0, 0, 0])
    gp = window.poll()["gamepad"]
    assert gp["move"] == (0.0, 0.0) and gp["look"] == (0.0, 0.0)
    assert not gp["jump"] and not gp["fire"]


def test_gamepad_four_axis_layout(window):
    # 4-axis pad: right stick on 2/3, fire only via bumper (button 5).
    window._joystick = _FakeJoystick(
        axes=[0.0, 0.0, 0.7, 0.6], buttons=[0, 0, 0, 0, 0, 1])
    gp = window.poll()["gamepad"]
    assert gp["look"] == (0.7, 0.6)
    assert gp["fire"] and not gp["jump"]


def test_gamepad_errors_fall_back_to_none(window):
    class Broken:
        def get_numaxes(self):
            raise RuntimeError("unplugged")

    window._joystick = Broken()
    assert window.poll()["gamepad"] is None


# --- clickable HUD geometry (r5: the reference's mouse-driven panel) -----

def test_panel_geometry_hit_and_value():
    """panel_hit_row finds the row whose slider track contains the
    pointer; slider_value maps track x to [lo, hi] with clamping."""
    from softwarerenderer_tpu.io_host import ui
    panel = (20, 50)
    n = 10
    for row in (0, 4, 9):
        rx, ry, rw, rh = ui.panel_slider_rect(panel, row)
        assert ui.panel_hit_row(panel, n, (rx + 2, ry + 1)) == row
        assert ui.panel_hit_row(panel, n, (rx - 1, ry + 1)) is None
        assert ui.panel_hit_row(panel, n, (rx + rw + 1, ry + 1)) is None
    assert ui.panel_hit_row(panel, n, (0, 0)) is None
    # below the last row
    _, ly, _, _ = ui.panel_slider_rect(panel, n - 1)
    assert ui.panel_hit_row(panel, n, (panel[0] + 200,
                                       ly + ui.PANEL_ROW_H + 4)) is None
    # endpoints map to lo/hi; out-of-track x clamps
    rx, ry, rw, rh = ui.panel_slider_rect(panel, 3)
    assert ui.slider_value(panel, 3, rx, 1.0, 5.0) == 1.0
    assert ui.slider_value(panel, 3, rx + rw, 1.0, 5.0) == 5.0
    assert ui.slider_value(panel, 3, rx - 50, 1.0, 5.0) == 1.0
    mid = ui.slider_value(panel, 3, rx + (rw - 1) / 2, 0.0, 2.0)
    assert abs(mid - 1.0) < 0.05


def test_chat_input_rect_tracks_messages():
    """The focusable input row sits under the visible messages and stops
    growing at max_lines (the scrollback window)."""
    from softwarerenderer_tpu.io_host import ui
    r0 = ui.chat_input_rect((16, 16), 0, 8, 640, 480)
    r3 = ui.chat_input_rect((16, 16), 3, 8, 640, 480)
    assert r3[1] == r0[1] + 3 * 16
    r_many = ui.chat_input_rect((16, 16), 50, 8, 640, 480)
    assert r_many[1] == r0[1] + 8 * 16
    # negative anchors resolve from the window edge
    rneg = ui.chat_input_rect((-336, 16), 0, 8, 640, 480)
    assert rneg[0] == 640 - 336
