#!/usr/bin/env python
"""Automated on-TPU Mosaic verification tier (VERDICT r2 #2 / weak #1).

The automated pytest suite pins itself to a CPU mesh and exercises the
Pallas kernels in interpret mode only — a *different compilation* of the
hot path than production.  This script runs the MOSAIC compilation
(interpret=False) on the real chip and gates machine-readably:

  1. opaque tile kernel vs the XLA fused path, 1080p dust2 — pixel parity
     fraction must be 0 (the round-2 claim, now guarded)
  2. depth-peeled K-buffer (K=4) vs the XLA K-slot fold — parity 0
  3. Mesh((1,1)) sharded frame vs the unsharded Pallas frame — exact
     pixels AND within TIME_RATIO of its frame time (the zero-overhead
     proof a single chip can give for the shard_map kernel path)
  4. golden subset: BASELINE configs 1-3 rendered through the Mosaic
     kernel vs the checked-in tests/goldens PNGs (same tolerance as
     tests/test_goldens.py)

Writes TPUCHECK.json {"ok": bool, "checks": [...]} to the repo root and
exits non-zero on any failure.  Wire-up: `scripts/ci.sh --tpu` (run each
round alongside bench.py; BENCHMARKS.md references the artifact).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

TIME_RATIO = 1.15
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8,
                    help="timed frames per measurement")
    ap.add_argument("--out", default=os.path.join(REPO, "TPUCHECK.json"))
    args = ap.parse_args()

    import jax
    if jax.devices()[0].platform == "cpu":
        print("tpu_ci: no TPU device visible; refusing to fake the tier",
              file=sys.stderr)
        sys.exit(2)

    import functools

    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.parallel import (
        make_mesh,
        render_frame_sharded,
        shard_scene_triangles,
    )
    from softwarerenderer_tpu.utils.profiling import timed_frames

    checks = []

    def check(name, ok, **info):
        checks.append(dict(name=name, ok=bool(ok), **info))
        print(json.dumps(checks[-1]), flush=True)

    W, H = 1920, 1080
    scene = jax.device_put(bench.build_scene())

    # ---- 1. opaque Mosaic kernel vs XLA fused parity + win --------------
    engp = Engine(scene, RenderParams(width=W, height=H, use_pallas=True))
    engx = Engine(scene, RenderParams(width=W, height=H, use_pallas=False))
    u = bench.camera_uniforms(engp.uniforms, 7)
    cp, dp = map(np.asarray, engp.render(u))
    cx, dx = map(np.asarray, engx.render(u))
    cfrac = float((np.abs(cp - cx).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(dp - dx) > 1e-5).mean())
    spf_p = timed_frames(
        lambda i: engp.render(bench.camera_uniforms(engp.uniforms, i)),
        args.frames)
    spf_x = timed_frames(
        lambda i: engx.render(bench.camera_uniforms(engx.uniforms, i)),
        args.frames)
    check("mosaic_opaque_parity", cfrac == 0.0 and dfrac == 0.0,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          pallas_ms=round(spf_p * 1e3, 2), xla_ms=round(spf_x * 1e3, 2),
          pallas_beats_xla=spf_p < spf_x)

    # ---- 2. depth-peeled K-buffer parity --------------------------------
    K = 4
    engkp = Engine(scene, RenderParams(width=W, height=H, use_pallas=True,
                                       kbuffer=K))
    engkx = Engine(scene, RenderParams(width=W, height=H, use_pallas=False,
                                       kbuffer=K))
    ckp, dkp = map(np.asarray, engkp.render(u))
    ckx, dkx = map(np.asarray, engkx.render(u))
    cfrac = float((np.abs(ckp - ckx).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(dkp - dkx) > 1e-5).mean())
    spf_k = timed_frames(
        lambda i: engkp.render(bench.camera_uniforms(engkp.uniforms, i)),
        args.frames)
    check(f"mosaic_kbuffer{K}_parity", cfrac == 0.0 and dfrac == 0.0,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          kbuffer_ms=round(spf_k * 1e3, 2))

    # ---- 3. Mesh((1,1)) sharded kernel == unsharded, near-zero overhead -
    params = RenderParams(width=W, height=H, use_pallas=True)
    mesh = make_mesh(1, 1)
    sscene = jax.device_put(shard_scene_triangles(bench.build_scene(), 1))
    with mesh:
        sharded = jax.jit(functools.partial(render_frame_sharded,
                                            params=params, mesh=mesh))
        cs, ds = map(np.asarray, sharded(sscene, u))
        spf_s = timed_frames(
            lambda i: sharded(sscene,
                              bench.camera_uniforms(engp.uniforms, i)),
            args.frames)
    cmax = float(np.abs(cs - cp).max())
    dmax = float(np.abs(ds - dp).max())
    ratio = spf_s / spf_p
    check("sharded_mesh11_kernel", cmax == 0.0 and dmax == 0.0
          and ratio <= TIME_RATIO,
          color_max_diff=cmax, depth_max_diff=dmax,
          sharded_ms=round(spf_s * 1e3, 2),
          unsharded_ms=round(spf_p * 1e3, 2), ratio=round(ratio, 3))

    # ---- 4. golden subset through the Mosaic kernel ---------------------
    # Gate: Mosaic vs the XLA fused path ON THE SAME DEVICE (tight —
    # borderline edge pixels may flip between programs, so allow a tiny
    # fraction), plus a LOOSE sanity diff against the checked-in PNG
    # (rendered by the CPU backend: cross-backend edge flips at these
    # small resolutions put ~0.4-1% of pixels off by more than 2/255 —
    # measured r3; catching gross regressions is the PNG's job, exactness
    # is the on-device A/B's).
    from PIL import Image

    from scripts.make_goldens import GOLDEN_SIZES
    from softwarerenderer_tpu.models import scene as scene_mod
    for n in (1, 2, 3):
        w, h = GOLDEN_SIZES[n]
        insts, _, _, ufn, ekw = bench.config_workload(n)
        sc = scene_mod.build_scene_buffers(insts)
        engm = Engine(sc, RenderParams(width=w, height=h), **ekw)
        engf = Engine(sc, RenderParams(width=w, height=h,
                                       use_pallas=False), **ekw)
        uu = dict(engm.uniforms)
        if ufn:
            ufn(uu, sc)
        cm, dm = map(np.asarray, engm.render(uu))
        cf, df = map(np.asarray, engf.render(uu))
        ab_frac = float((np.abs(cm - cf).max(axis=-1) > 1e-5).mean())
        got = np.asarray(engm.present(uu))
        golden = np.asarray(Image.open(
            os.path.join(GOLDEN_DIR, f"config{n}.png")))
        diff = np.abs(got.astype(np.int32) - golden.astype(np.int32))
        frac_off = float(np.mean(np.any(diff > 2, axis=-1)))
        mean = float(np.mean(diff))
        check(f"mosaic_golden_config{n}",
              ab_frac <= 2e-3 and frac_off < 2e-2 and mean < 2.0,
              mosaic_vs_fused_frac=round(ab_frac, 6),
              png_frac_off=round(frac_off, 6), png_mean=round(mean, 4))

    # ---- 5. active-triangle compaction parity on Mosaic -----------------
    # Compacted vs uncompacted LOD frame through the real kernel: winner
    # selection is provably invariant (PARITY.md), this guards the
    # compiled reality each round.
    from softwarerenderer_tpu.models import primitives
    from softwarerenderer_tpu.ops import lod as lod_mod
    from softwarerenderer_tpu.utils import mathlib as ml
    mesh_l = lod_mod.add_lods(
        primitives.uv_sphere(0.45, rings=14, sectors=20),
        cells=(8, 4), px=(60.0, 24.0))
    insts = [scene_mod.MeshInstance(
        mesh_l, ml.translation([(i % 8 - 4) * 1.5, 0.0,
                                -3.0 - (i // 8) * 2.0]))
        for i in range(32)]
    sc = scene_mod.build_scene_buffers(insts)
    cap = lod_mod.suggested_active_cap(sc)
    eng0 = Engine(sc, RenderParams(width=640, height=360))
    engc = Engine(sc, RenderParams(width=640, height=360, active_cap=cap))
    uu = dict(eng0.uniforms)
    c0, d0 = map(np.asarray, eng0.render(uu))
    cc, dc = map(np.asarray, engc.render(uu))
    cfrac = float((np.abs(c0 - cc).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(d0 - dc) > 1e-5).mean())
    check("mosaic_active_cap_parity", cfrac == 0.0 and dfrac == 0.0,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          active_cap=cap)

    ok = all(c["ok"] for c in checks)
    out = {"ok": ok, "device": str(jax.devices()[0].device_kind),
           "time": time.strftime("%Y-%m-%dT%H:%M:%S"), "checks": checks}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"tpu_ci_ok": ok, "artifact": args.out}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
