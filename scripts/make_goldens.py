#!/usr/bin/env python
"""Generate golden PNGs for the 5 BASELINE configs into tests/goldens/.

Renders each config's scene at a reduced (aspect-preserving) resolution on
the deterministic CPU backend and writes PNGs that pin the images across
rounds (VERDICT r1 missing #4).  tests/test_goldens.py re-renders the same
frames and gates on a pixel tolerance.

Run from a clean env (the script self-sanitizes like tests/conftest.py):
    python scripts/make_goldens.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

# (config, width, height): aspect-preserving reductions of the BASELINE
# resolutions, small enough for fast CPU renders and small PNGs.
GOLDEN_SIZES = {1: (320, 240), 2: (320, 180), 3: (480, 270),
                4: (320, 180), 5: (480, 270)}


def _sanitize_env():
    if ".axon_site" not in os.environ.get("PYTHONPATH", "") \
            and os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    import subprocess
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    sys.exit(subprocess.run([sys.executable, os.path.abspath(__file__)]
                            + sys.argv[1:], env=env).returncode)


def render_golden(n: int):
    """Render BASELINE config n's golden frame (uint8 RGB) at golden size."""
    import numpy as np
    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import (Engine,
                                             default_frame_uniforms)
    w, h = GOLDEN_SIZES[n]
    if n == 4:
        # Physics-coupled config: the render half on the dust2 scene with
        # the pinned bench camera (one representative frame; the physics
        # step itself is covered by test_sim.py).
        from softwarerenderer_tpu.models import scene as scene_mod
        scene = bench.build_scene()
        eng = Engine(scene, RenderParams(width=w, height=h))
        u = bench.camera_uniforms(eng.uniforms, frame_idx=0)
        return eng.present(u)
    insts, _, _, ufn, ekw = bench.config_workload(n)
    from softwarerenderer_tpu.models import scene as scene_mod
    scene = scene_mod.build_scene_buffers(insts)
    eng = Engine(scene, RenderParams(width=w, height=h), **ekw)
    u = dict(eng.uniforms)
    if ufn:
        ufn(u, scene)
    return eng.present(u)


def save_png(path, rgb):
    from PIL import Image
    Image.fromarray(rgb).save(path)


def main():
    _sanitize_env()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for n in sorted(GOLDEN_SIZES):
        rgb = render_golden(n)
        path = os.path.join(GOLDEN_DIR, f"config{n}.png")
        save_png(path, rgb)
        print(f"wrote {path} {rgb.shape}")


if __name__ == "__main__":
    main()
