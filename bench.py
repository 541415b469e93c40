#!/usr/bin/env python
"""Benchmark: Mpixels/s shaded at 1080p on the Dust2 scene (one TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = TPU Mpixels/s ÷ the CPU golden reference's Mpixels/s on the
same scene (the reference publishes no numbers — BASELINE.md — so the
measured NumPy-faithful CPU implementation is the baseline, per
BASELINE.json's north star "≥100× CPU Mpixels/s at 1080p on one chip").

Usage:
  python bench.py            # full: 1080p dust2 on the default JAX device
  python bench.py --small    # quick smoke: 320x240, fewer frames
"""

import argparse
import json
import os
import sys
import time

# Persistent compilation cache: the axon remote-compile path can be slow;
# identical programs then load from disk across processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


DUST2 = "/root/reference/OutputAssets/Assets/dust2/scene.gltf"


def build_scene():
    from softwarerenderer_tpu.io_host import model_loader
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops

    fallback = np.asarray(tex_ops.checkerboard(
        64, 8, (0.8, 0.75, 0.6, 1.0), (0.55, 0.5, 0.4, 1.0))["data"])
    if os.path.exists(DUST2):
        model = model_loader.load_model(DUST2)
        insts = model_loader.model_instances(model,
                                             fallback_texture=fallback)
    else:  # fallback workload with the same triangle count
        insts = [scene_mod.MeshInstance(
            primitives.random_triangle_soup(9061, seed=0), texture=fallback)]
    return scene_mod.build_scene_buffers(insts)


def camera_uniforms(uniforms, frame_idx=0):
    from softwarerenderer_tpu.utils import mathlib as ml
    u = dict(uniforms)
    u["camera_position"] = np.float32([0.0, 2.5, 6.0])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.6 + 0.01 * frame_idx), np.float32(-0.15), np.float32(0))
    return u


# Watchdog window per device sync: a wedged chip/tunnel turns into a
# loud DeviceSyncTimeout + thread dump instead of a silently hung bench
# (VERDICT r3 weak #1).  Compiles are charged to the first sync, hence
# the generous default; override with SRT_SYNC_TIMEOUT_S.
SYNC_TIMEOUT_S = float(os.environ.get("SRT_SYNC_TIMEOUT_S", "600"))


def _progress(msg: str) -> None:
    """Stage progress on stderr (stdout carries only the JSON line) so a
    hang is attributable to a named stage in seconds."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def bench_tpu(width, height, frames, use_pallas=None):
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.utils.profiling import timed_frames

    _progress(f"building dust2 scene ({width}x{height})")
    scene = build_scene()
    params = RenderParams(width=width, height=height)
    if use_pallas is not None:
        params = params.replace(use_pallas=use_pallas)
    eng = Engine(scene, params)

    # Mosaic-safe methodology (BENCHMARKS.md): pipeline N frames with
    # varied uniforms, sync ONCE via a data-dependent scalar readback —
    # block_until_ready under-reports Pallas custom-calls over the tunnel.
    _progress(f"timing {frames} device frames (compile on first)")
    spf = timed_frames(
        lambda i: eng.render(camera_uniforms(eng.uniforms, i)), frames,
        timeout_s=SYNC_TIMEOUT_S)
    _progress(f"device frame: {spf * 1e3:.2f} ms")
    return width * height / spf / 1e6, 1.0 / spf


def bench_game_loop(width, height, frames, bots=0, network=False,
                    present=True, raytrace=0):
    """The PLAYABLE dust2 loop end-to-end (VERDICT r3 weak #4): input
    script, physics, bots, decals, HUD, pipelined present — everything
    apps/dust2.Dust2Game.step does per frame, headless, timed on the
    host wall clock (the reference's one lived metric, the ImGui FPS
    counter, /root/reference/Renderer.cs:664).  network=True runs the
    real UDP stack against localhost (this instance elects itself host
    and streams Update RPCs); False skips sockets entirely."""
    from softwarerenderer_tpu.apps.dust2 import Dust2Game

    _progress(f"game-loop: starting headless dust2 {width}x{height} "
              f"bots={bots} network={'loopback-host' if network else 'off'}"
              + (f" raytrace={raytrace}" if raytrace else ""))
    game = Dust2Game(width=width, height=height, render_scale=1.0,
                     headless=True, offline=not network, seed=0,
                     bots=bots, port=17845, raytrace=raytrace)
    game.mouse_locked = True
    # Deeper fetch pipeline on the tunneled device: the remote transfer
    # path sustains ~2x the throughput with 3-4 frames in flight
    # (measured probe: depth 2 -> 4 = 34 -> 19 ms per 640x400 fetch);
    # costs one extra frame of present latency.
    game.present_depth = int(os.environ.get("SRT_PRESENT_DEPTH", 3))

    if not present:
        # present=False: the frame stays on device except every 8th
        # (backpressure + an honest sync) — models a locally-attached
        # display path where the device→host copy is ~1 ms, isolating
        # the HOST loop from the remote tunnel's per-transfer round trip
        # (~25 ms + bandwidth, which dominates the present=True number
        # on tunneled devices and vanishes on local hardware).  The
        # fused step's aux vector (pose/bot outputs) still fetches
        # every frame — only the frame-sized rgb transfer is skipped.
        game._present_nth = 8

    def scripted(i):
        # Deterministic play: strafe-run with a slow look sweep and a
        # shot every 1.5 s — touches movement, physics, recoil, decals.
        keys = {"w", "d"} if (i // 45) % 2 == 0 else {"w", "a"}
        if i % 120 == 15:
            keys = keys | {"space"}
        return {"quit": False, "keys": keys,
                "mouse_delta": (1.5 if (i // 90) % 2 == 0 else -1.5, 0.2),
                "mouse_down": i % 90 == 5, "chars": "", "gamepad": None}

    # Warmup must cover one full script period (120 frames) so every
    # program the script can trigger — frame, character step, particle
    # step, the shoot raycast, the jump variant — compiles OUTSIDE the
    # timed window.
    warmup = 130
    for i in range(warmup):
        game.step(1 / 60, inputs=scripted(i))
    _progress("game-loop: warmup done, timing")
    t0 = time.perf_counter()
    for i in range(frames):
        game.step(1 / 60, inputs=scripted(warmup + i))
    dt = time.perf_counter() - t0
    game.close()
    fps = frames / dt
    _progress(f"game-loop: {1e3 * dt / frames:.2f} ms/frame ({fps:.1f} fps)")
    return width * height * fps / 1e6, fps


def bench_sharded(width, height, frames, n_fb):
    """The multi-chip 'pressable button' (VERDICT r3 #7): the SAME
    render_frame_sharded program that the CPU-mesh tests prove exact,
    timed over an fb=n_fb device mesh.  On a 1-chip host this measures
    the Mesh((1,1)) overhead (vs the unsharded kernel, TPUCHECK's
    sharded_overhead check); the moment an n_fb-chip slice exists the
    same command produces the scaled number — e.g. the 4K fb=2
    configuration BENCHMARKS.md's gather analysis predicts at ~58 fps."""
    import jax

    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.parallel import (
        make_mesh,
        render_frame_sharded,
        shard_scene_triangles,
    )
    from softwarerenderer_tpu.utils.profiling import timed_frames

    n_dev = len(jax.devices())
    if n_dev < n_fb:
        raise SystemExit(
            f"--mesh-fb {n_fb} needs {n_fb} devices, have {n_dev} "
            f"(the CPU-mesh correctness twin runs in tests/test_parallel)")
    _progress(f"sharded: building scene, fb={n_fb} mesh over "
              f"{n_dev} device(s)")
    scene = build_scene()
    params = RenderParams(width=width, height=height)
    sscene = jax.device_put(shard_scene_triangles(scene, 1))
    mesh = make_mesh(n_fb, 1)

    from softwarerenderer_tpu.engine import default_frame_uniforms
    base_u = camera_uniforms(default_frame_uniforms(width, height))

    with mesh:
        fn = jax.jit(lambda s, u: render_frame_sharded(s, u, params, mesh))

        def step(i):
            u = camera_uniforms(base_u, i)
            return fn(sscene, u)

        _progress(f"sharded: timing {frames} frames")
        spf = timed_frames(step, frames, timeout_s=SYNC_TIMEOUT_S)
    _progress(f"sharded frame: {spf * 1e3:.2f} ms")
    return width * height / spf / 1e6, 1.0 / spf


def bench_cpu_reference(width, height, frames=1, repeats=3,
                        budget_s=240.0):
    """Median of up to `repeats` runs of the golden NumPy implementation
    on the pinned dust2 workload AT THE SAME RESOLUTION as the TPU
    measurement (VERDICT r2 weak #5: the old 320×240 denominator made
    vs_baseline a cross-resolution extrapolation with ±15% drift).  A
    1080p CPU frame costs ~30 s, so the repeat loop stops once `budget_s`
    elapses (median of whatever completed; single runs wobble ±25%,
    VERDICT r1 weak #3)."""
    runs = []
    t0 = time.perf_counter()
    for _ in range(repeats):
        runs.append(_cpu_reference_once(width, height, frames))
        if time.perf_counter() - t0 > budget_s:
            break
    runs.sort()
    return runs[len(runs) // 2]


def _cpu_reference_once(width, height, frames=1):
    from softwarerenderer_tpu import shaders
    from softwarerenderer_tpu.engine import camera_matrices, \
        default_frame_uniforms
    from softwarerenderer_tpu.io_host import model_loader
    from softwarerenderer_tpu.ops import texture as tex_ops
    from softwarerenderer_tpu.ref_cpu import rasterizer as ref

    u = camera_uniforms(default_frame_uniforms(width, height))
    view, proj = camera_matrices(u, width, height, xp=np)
    fallback = {"data": np.asarray(tex_ops.checkerboard(
        64, 8, (0.8, 0.75, 0.6, 1.0), (0.55, 0.5, 0.4, 1.0))["data"])}
    meshes = (model_loader.load_model(DUST2).meshes
              if os.path.exists(DUST2) else [])
    t0 = time.perf_counter()
    for _ in range(frames):
        fb = ref.Framebuffer(width, height)
        fb.clear_color(u["clear_color"])
        for mesh in meshes:
            mu = dict(u)
            mu.update(model=np.eye(4, dtype=np.float32), view=view,
                      projection=proj, texture=fallback)
            vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                            mesh["normal"], mesh["color"])
            ref.render_mesh(fb, vin, mesh["indices"], mu,
                            shaders.default_vertex_shader,
                            shaders.default_fragment_shader)
    dt = time.perf_counter() - t0
    return width * height * frames / dt / 1e6


def _bench_engine(insts, width, height, frames, uniforms_fn=None,
                  use_pallas=None, **ekw):
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.utils.profiling import timed_frames

    scene = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=width, height=height)
    if use_pallas is not None:
        params = params.replace(use_pallas=use_pallas)
    eng = Engine(scene, params, **ekw)
    u = dict(eng.uniforms)
    if uniforms_fn:
        uniforms_fn(u, scene)

    def step(i):
        u["fov_degrees"] = np.float32(90.0 + 0.01 * i)  # defeat caching
        return eng.render(u)

    spf = timed_frames(step, frames, timeout_s=SYNC_TIMEOUT_S)
    return width * height / spf / 1e6, 1.0 / spf


def config_workload(n: int):
    """Scene + camera for BASELINE config n (1,2,3,5) — shared between the
    benchmark and the golden-image generator (tests/goldens).  Returns
    (instances, width, height, uniforms_fn, engine_kwargs); config 4 (the
    physics-coupled step) stays inline in bench_config."""
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops
    from softwarerenderer_tpu.utils import mathlib as ml

    checker = np.asarray(tex_ops.checkerboard(64, 8)["data"])
    if n == 1:    # textured cube + directional light, 640x480
        insts = [scene_mod.MeshInstance(
            primitives.cube(1.5), ml.matrix_from_yaw_pitch_roll(0.5, 0.3, 0)
            @ ml.translation([0, 0, -3]), texture=checker)]
        return insts, 640, 480, None, {}
    if n == 2:    # OBJ mesh + texture sampling + z-buffer, 1280x720
        import tempfile
        from softwarerenderer_tpu.io_host import model_loader
        sph = primitives.uv_sphere(1.0, rings=24, sectors=48)
        with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                         delete=False) as f:
            for p in sph["position"]:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for t in sph["uv"]:
                f.write(f"vt {t[0]} {1.0 - t[1]}\n")
            for nn in sph["normal"]:
                f.write(f"vn {nn[0]} {nn[1]} {nn[2]}\n")
            for a, b, c in sph["indices"] + 1:
                f.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
            path = f.name
        model = model_loader.load_model(path)
        insts = model_loader.model_instances(
            model, ml.translation([0.0, 0.0, -3.0]),
            texture_override=checker)
        return insts, 1280, 720, None, {}
    if n == 3:    # multi-object frustum-culled multi-light, 1080p
        from softwarerenderer_tpu.models.scene import Light, LightType
        from softwarerenderer_tpu.ops.lighting import (
            lit_scene_vertex_shader, multi_light_fragment_shader,
            pack_lights)
        rng = np.random.default_rng(0)
        insts = [scene_mod.MeshInstance(
            primitives.plane(60.0), ml.translation([0, -1, 0]),
            texture=checker)]
        for _ in range(40):
            pos = rng.uniform(-25, 25, 3).astype(np.float32)
            pos[1] = rng.uniform(0, 2)
            insts.append(scene_mod.MeshInstance(
                primitives.cube(1.0), ml.translation(pos), texture=checker))
        lights = [Light(light_type=LightType.DIRECTIONAL,
                        direction=(0.4, -1.0, -0.3), color=(0.8, 0.8, 0.7)),
                  Light(light_type=LightType.POINT, position=(0, 3, -5),
                        color=(4, 1, 1), attenuation_linear=0.3),
                  Light(light_type=LightType.POINT, position=(8, 2, 4),
                        color=(1, 1, 5), attenuation_quadratic=0.1),
                  Light(light_type=LightType.SPOT, position=(-5, 6, 0),
                        direction=(0, -1, 0), color=(3, 3, 3),
                        spot_inner=0.4, spot_outer=0.7)]

        def add_lights(u, scene):
            u.update(pack_lights(lights))
            u["camera_position"] = np.float32([0, 2, 10])
        return insts, 1920, 1080, add_lights, dict(
            vertex_shader=lit_scene_vertex_shader,
            fragment_shader=multi_light_fragment_shader)
    if n == 5:    # 1000+ instanced meshes, binned raster, 4K
        rng = np.random.default_rng(1)
        insts = []
        for i in range(1100):
            pos = rng.uniform(-40, 40, 3).astype(np.float32)
            pos[1] = rng.uniform(-2, 6)
            insts.append(scene_mod.MeshInstance(
                primitives.cube(1.2),
                (ml.matrix_from_yaw_pitch_roll(
                    float(rng.uniform(0, 3)), 0.0, 0.0)
                 @ ml.translation(pos)).astype(np.float32),
                texture=checker))

        def cam(u, scene):
            u["camera_position"] = np.float32([0, 2, 55])
            u["far_clip"] = np.float32(300.0)
        return insts, 3840, 2160, cam, {}
    raise ValueError(f"unknown workload config {n}")


def bench_config(n: int, frames: int = 20):
    """The 5 BASELINE.json benchmark configs."""
    if n in (1, 2, 3, 5):
        insts, w, h, ufn, ekw = config_workload(n)
        if n == 5:
            frames = max(frames // 2, 5)
        return _bench_engine(insts, w, h, frames, uniforms_fn=ufn, **ekw)
    if n == 4:    # physics-coupled character+render in ONE jitted step
        import functools
        import jax
        import jax.numpy as jnp
        from softwarerenderer_tpu import RenderParams
        from softwarerenderer_tpu.engine import render_frame
        from softwarerenderer_tpu.sim import (build_collision_world,
                                              character_step,
                                              default_character_params,
                                              initial_character_state)
        scene = build_scene()
        width, height = 1280, 720
        params = RenderParams(width=width, height=height)
        cp = default_character_params()

        @functools.partial(jax.jit, static_argnames=())
        def step(state, scene, u):
            world = build_collision_world(scene)
            state = character_step(state, jnp.asarray([0.0, 0.0, -1.0]),
                                   False, 1.0 / 60.0, world, cp)
            u = dict(u)
            u["camera_position"] = state["position"] + cp["cam_offset"]
            color, depth = render_frame(scene, u, params)
            return state, color, depth

        from softwarerenderer_tpu.engine import default_frame_uniforms
        from softwarerenderer_tpu.utils.profiling import timed_frames
        u = camera_uniforms(default_frame_uniforms(width, height))
        state = initial_character_state([0.0, 3.0, 6.0])
        scene = jax.device_put(scene)
        out_box = [step(state, scene, u)]

        def one(i):
            out_box[0] = step(out_box[0][0], scene, u)
            return out_box[0]

        spf = timed_frames(one, frames, timeout_s=SYNC_TIMEOUT_S)
        return width * height / spf / 1e6, 1.0 / spf
    raise ValueError(f"unknown config {n}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the slow CPU-reference measurement")
    ap.add_argument("--config", type=int, default=None,
                    help="run one BASELINE config (1-5) instead of the "
                         "headline dust2 1080p metric")
    ap.add_argument("--use-pallas", action="store_true", default=None,
                    help="force the Pallas tile kernel (default: on for "
                         "TPU+LESS_EQUAL via RenderParams)")
    ap.add_argument("--no-pallas", dest="use_pallas", action="store_false",
                    help="force the XLA fused path")
    ap.add_argument("--game-loop", action="store_true",
                    help="benchmark the PLAYABLE dust2 loop (host wall "
                         "clock incl. input/physics/HUD/present) instead "
                         "of the jitted device frame")
    ap.add_argument("--bots", type=int, default=0,
                    help="--game-loop: spawn N bot agents")
    ap.add_argument("--network", action="store_true",
                    help="--game-loop: run the real UDP stack "
                         "(localhost host election) instead of offline")
    ap.add_argument("--raytrace", type=int, nargs="?", const=24,
                    default=0, metavar="CAP",
                    help="--game-loop: render through the ray tracer "
                         "(dust2 --raytrace; CAP = per-bundle cluster "
                         "budget)")
    ap.add_argument("--no-present", action="store_true",
                    help="--game-loop: leave frames on device (sync every "
                         "8th) — isolates the host loop from the remote "
                         "tunnel's per-frame transfer cost")
    ap.add_argument("--mesh-fb", type=int, default=None,
                    help="time render_frame_sharded over an fb=N device "
                         "mesh (the multi-chip button; needs N devices)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    args = ap.parse_args()

    if args.game_loop:
        w = args.width or 1920
        h = args.height or 1080
        mpix, fps = bench_game_loop(w, h, args.frames or 120,
                                    bots=args.bots, network=args.network,
                                    present=not args.no_present,
                                    raytrace=args.raytrace)
        print(json.dumps({
            "metric": f"game_loop_fps_{h}p_dust2"
                      + ("_raytrace" if args.raytrace else "")
                      + ("_nopresent" if args.no_present else ""),
            "value": round(fps, 2), "unit": "fps",
            "vs_baseline": None,
            "extra": {"mpixels_per_s": round(mpix, 2),
                      "bots": args.bots,
                      "network": bool(args.network),
                      "raytrace": args.raytrace,
                      "present": not args.no_present,
                      "resolution": f"{w}x{h}",
                      "device": _device_name()},
        }))
        return

    if args.mesh_fb is not None:
        w = args.width or 1920
        h = args.height or 1080
        mpix, fps = bench_sharded(w, h, args.frames or 20, args.mesh_fb)
        print(json.dumps({
            "metric": f"mpixels_per_s_{h}p_dust2_fb{args.mesh_fb}",
            "value": round(mpix, 2), "unit": "Mpixels/s",
            "vs_baseline": None,
            "extra": {"fps": round(fps, 2), "n_fb": args.mesh_fb,
                      "resolution": f"{w}x{h}",
                      "device": _device_name()},
        }))
        return

    if args.config is not None:
        mpix, fps = bench_config(args.config, args.frames or 20)
        print(json.dumps({
            "metric": f"mpixels_per_s_config{args.config}",
            "value": round(mpix, 2), "unit": "Mpixels/s",
            "vs_baseline": None,
            "extra": {"fps": round(fps, 2), "device": _device_name()},
        }))
        return

    if args.small:
        width, height, frames = 320, 240, 10
        ref_w, ref_h = 160, 120
    else:
        # Same-resolution denominator: the CPU golden runs the SAME
        # 1920×1080 frame the TPU number is measured on.
        width, height, frames = 1920, 1080, 30
        ref_w, ref_h = 1920, 1080

    mpix, fps = bench_tpu(width, height, args.frames or frames,
                          use_pallas=args.use_pallas)
    if args.no_baseline:
        cpu_mpix = None
        vs = None
    else:
        cpu_mpix = bench_cpu_reference(ref_w, ref_h)
        vs = mpix / cpu_mpix
    # The PLAYABLE numbers ride the same driver artifact (VERDICT r4 #6):
    # the end-to-end game loop at 640×400 (with the pipelined present)
    # and at the headline resolution with the frame left on device
    # (models a locally-attached display).  Failures degrade to null
    # rather than discarding the headline metric.
    game_rows = {}
    if not args.small:
        for key, (gw, gh, pres, rt) in {
            "game_loop_fps_640x400": (640, 400, True, 0),
            "game_loop_fps_640x400_raytrace": (640, 400, True, 24),
            f"game_loop_fps_{height}p_nopresent": (width, height, False,
                                                   0),
        }.items():
            try:
                _, gfps = bench_game_loop(gw, gh, 120, present=pres,
                                          raytrace=rt)
                game_rows[key] = round(gfps, 2)
            except Exception as e:      # noqa: BLE001 — report, don't die
                _progress(f"game-loop row {key} failed: {e!r}")
                game_rows[key] = None
    print(json.dumps({
        "metric": f"mpixels_per_s_{height}p_dust2",
        "value": round(mpix, 2),
        "unit": "Mpixels/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": {"fps": round(fps, 2),
                  "cpu_ref_mpixels_per_s": (round(cpu_mpix, 3)
                                            if cpu_mpix else None),
                  "resolution": f"{width}x{height}",
                  "device": _device_name(),
                  **game_rows},
    }))


def _device_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
