"""Model-viewer app: orbit framing, format loading, wireframe toggle."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["cube.fbx", "cube.dae"])
def test_viewer_headless_renders(name, tmp_path):
    from softwarerenderer_tpu.apps.viewer import Viewer
    from softwarerenderer_tpu.io_host import model_loader

    model_loader.clear_caches()
    v = Viewer(os.path.join(FIXDIR, name), width=160, height=120,
               render_scale=1.0, headless=True,
               out=str(tmp_path / "v.png"))
    try:
        v.step(1 / 60)
        v.step(1 / 60)
        frame = v.window.last_frame
        assert frame is not None and frame.shape == (120, 160, 3)
        # the auto-framed model is on screen (not all clear color)
        assert (frame.std(axis=-1) > 0).sum() > 100
        # wireframe toggle renders through the forward path
        from softwarerenderer_tpu.config import DebugMode
        v.mode = DebugMode.WIREFRAME
        v.step(1 / 60)
        assert v.window.last_frame is not None
    finally:
        v.window.close()


@pytest.mark.slow
def test_viewer_exports_glb(tmp_path, monkeypatch):
    """F10 export: the viewer converts any loaded format to GLB, and the
    exported file reloads with identical baked geometry."""
    from softwarerenderer_tpu.apps.viewer import Viewer
    from softwarerenderer_tpu.io_host import model_loader

    model_loader.clear_caches()
    monkeypatch.chdir(tmp_path)
    v = Viewer(os.path.join(FIXDIR, "cube.3ds"), width=96, height=64,
               render_scale=1.0, headless=True)
    try:
        out = v.export_glb()
        assert out and os.path.isfile(out)
        model_loader.clear_caches()
        back = model_loader.load_model(out)
        src = model_loader.load_model(os.path.join(FIXDIR, "cube.3ds"))
        assert len(back.meshes) == len(src.meshes)
        np.testing.assert_array_equal(back.meshes[0]["position"],
                                      src.meshes[0]["position"])
    finally:
        v.window.close()


@pytest.mark.slow
def test_viewer_records_avi(tmp_path):
    from softwarerenderer_tpu.apps.viewer import Viewer
    from softwarerenderer_tpu.io_host import model_loader
    from softwarerenderer_tpu.utils.video import read_avi

    model_loader.clear_caches()
    clip = str(tmp_path / "orbit.avi")
    v = Viewer(os.path.join(FIXDIR, "cube.dae"), width=96, height=64,
               render_scale=1.0, headless=True, record=clip,
               record_fps=12.0)
    v.run(frames=3)
    frames, fps = read_avi(clip)
    assert frames.shape == (3, 64, 96, 3)
    assert fps == pytest.approx(12.0, abs=1e-3)
    # recorded pixels == the last presented frame
    assert (frames[-1] == v.window.last_frame).all()


@pytest.mark.slow
def test_viewer_raytrace_toggle():
    from softwarerenderer_tpu.apps.viewer import Viewer
    from softwarerenderer_tpu.io_host import model_loader

    model_loader.clear_caches()
    v = Viewer(os.path.join(FIXDIR, "cube.dae"), width=64, height=48,
               render_scale=1.0, headless=True)
    try:
        v.step(1 / 60)
        base = v.window.last_frame.copy()
        v.raytrace = True
        v.step(1 / 60)
        rt = v.window.last_frame
        assert rt is not None and rt.shape == base.shape
        # both show the model against the clear color
        assert (rt.std(axis=-1) > 0).sum() > 50
    finally:
        v.window.close()
