"""Aux subsystem tests: profiling counters, checkpoint round-trip, config."""

import dataclasses
import os
import time

import numpy as np

from softwarerenderer_tpu.utils import appconfig, checkpoint, profiling


def test_frame_stats_counters():
    st = profiling.FrameStats()
    st.frame(pixels=100_000, triangles=5_000)
    for _ in range(10):
        time.sleep(0.002)
        with st.stage("render"):
            time.sleep(0.001)
        st.frame(pixels=100_000, triangles=5_000)
    c = st.counters()
    assert c["fps"] > 0
    assert c["mpixels_per_s"] > 0
    assert c["stage_render_ms"] >= 1.0
    assert len(st.debug_lines()) >= 3


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "character": {"position": np.float32([1, 2, 3]),
                      "grounded": np.asarray(True),
                      "noclip": np.asarray(False)},
        "players": [{"id": np.int32(1), "name": "alice",
                     "pose": np.zeros((4,), np.float32)}],
        "tick": np.int64(42),
        "none_field": None,
    }
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, state)
    back = checkpoint.load(p)
    np.testing.assert_array_equal(back["character"]["position"],
                                  state["character"]["position"])
    assert bool(back["character"]["grounded"])
    assert back["players"][0]["name"] == "alice"
    assert int(back["tick"]) == 42
    assert back["none_field"] is None


def test_checkpoint_resume_character_sim():
    """Save mid-simulation, restore, and continue identically."""
    import jax
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.sim import (build_collision_world,
                                          character_step,
                                          default_character_params,
                                          initial_character_state)
    world = build_collision_world(scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.plane(30.0))]))
    params = default_character_params()
    step = jax.jit(lambda s: character_step(
        s, np.float32([0, 0, -1]), False, 1 / 60, world, params))
    s = initial_character_state([0.0, 2.0, 0.0])
    for _ in range(20):
        s = step(s)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sim.npz")
        checkpoint.save(p, {k: np.asarray(v) for k, v in s.items()})
        restored = checkpoint.load(p)
    a, b = s, restored
    for _ in range(20):
        a = step(a)
        b = step(b)
    np.testing.assert_array_equal(np.asarray(a["position"]),
                                  np.asarray(b["position"]))


def test_appconfig_json_and_env(tmp_path):
    cfg = appconfig.AppConfig(width=320, fog_end=50.0)
    p = str(tmp_path / "srt.json")
    cfg.save(p)
    loaded = appconfig.load(p, env=False)
    assert loaded.width == 320 and loaded.fog_end == 50.0
    os.environ["SRT_MOVE_SPEED"] = "7.5"
    os.environ["SRT_FOG_COLOR"] = "0.1,0.2,0.3,1.0"
    try:
        loaded = appconfig.load(p, env=True)
        assert loaded.move_speed == 7.5
        assert loaded.fog_color == (0.1, 0.2, 0.3, 1.0)
    finally:
        del os.environ["SRT_MOVE_SPEED"]
        del os.environ["SRT_FOG_COLOR"]


def test_appconfig_defaults_match_reference():
    cfg = appconfig.AppConfig()
    assert cfg.render_scale == 0.25      # Renderer.cs:74
    assert cfg.fov_degrees == 90.0       # Renderer.cs:46
    assert cfg.char_height == 0.5        # CharacterController.cs:24
    assert cfg.port == 7777              # Networking.cs:71


def test_slog_kv_and_logger(capsys):
    from softwarerenderer_tpu.utils import slog
    assert slog.kv(a=1, b="x") == "a=1 b=x"
    log = slog.get_logger("test")
    log.info("hello %s", slog.kv(n=2))


def test_audio_pan_gains_constant_power():
    from softwarerenderer_tpu.io_host import audio
    import numpy as np
    for pan in (-1.0, -0.5, 0.0, 0.5, 1.0):
        l, r = audio.pan_gains(pan)
        assert abs(l * l + r * r - 1.0) < 1e-6
    assert audio.pan_gains(-1.0)[1] < 1e-6     # hard left: no right
    assert audio.pan_gains(1.0)[0] < 1e-6      # hard right: no left
    c = audio.pan_gains(0.0)
    assert abs(c[0] - c[1]) < 1e-6             # centered

    # direction_pan: source on the listener's right → pan +1
    p = audio.direction_pan([0, 0, 0], [1, 0, 0], [5, 0, 0])
    assert abs(p - 1.0) < 1e-6
    assert abs(audio.direction_pan([0, 0, 0], [1, 0, 0], [-5, 0, 0])
               + 1.0) < 1e-6
    assert audio.direction_pan([0, 0, 0], [1, 0, 0], [0, 0, -5]) == 0.0
    assert audio.direction_pan([0, 0, 0], [1, 0, 0], [0, 0, 0]) == 0.0
