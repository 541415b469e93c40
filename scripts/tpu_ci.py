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
  5. active-triangle compaction parity through the Mosaic kernel
  5b. capacity caps (pair_cap / global_cap / geom_cap) parity + counters
  6. skeletal skinning (level-scheduled FK, per-skin clock vector):
     Mosaic vs fused parity + the pose moves with the traced clock
  7. morph targets (animated weight track): Mosaic vs fused parity +
     the silhouette moves with the traced clock
  8. balanced='rows' Mesh((1,1)) frame through the Pallas kernel's
     tile-row map: bit-identical to the unsharded kernel, bounded ratio
  9. ray-trace pair-table winners identical to the brute raycast

Every stage is guarded by a hard watchdog (utils.profiling.arm_watchdog):
a wedged device produces a thread dump + exit 42 attributed to the named
stage within its window, never a silent hang (VERDICT r3 weak #1).

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
    from softwarerenderer_tpu.utils.profiling import (
        arm_watchdog,
        timed_frames,
    )

    checks = []
    wd_state = {"cancel": None}

    def stage(name, timeout_s=1500):
        """Per-stage hard watchdog (VERDICT r3 weak #1): a wedged device
        turns into a thread dump + exit 42 within the window, attributed
        to the named stage, instead of a silently hung session."""
        if wd_state["cancel"] is not None:
            wd_state["cancel"]()
        print(json.dumps({"stage": name}), flush=True)
        wd_state["cancel"] = arm_watchdog(f"tpu_ci:{name}", timeout_s)

    def check(name, ok, **info):
        checks.append(dict(name=name, ok=bool(ok), **info))
        print(json.dumps(checks[-1]), flush=True)

    W, H = 1920, 1080
    stage("build_scene")
    scene = jax.device_put(bench.build_scene())

    # ---- 1. opaque Mosaic kernel vs XLA fused parity + win --------------
    stage("opaque_parity")
    engp = Engine(scene, RenderParams(width=W, height=H, use_pallas=True))
    engx = Engine(scene, RenderParams(width=W, height=H, use_pallas=False))
    u = bench.camera_uniforms(engp.uniforms, 7)
    cp, dp = map(np.asarray, engp.render(u))
    cx, dx = map(np.asarray, engx.render(u))
    cfrac = float((np.abs(cp - cx).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(dp - dx) > 1e-5).mean())
    spf_p = timed_frames(
        lambda i: engp.render(bench.camera_uniforms(engp.uniforms, i)),
        args.frames, timeout_s=600)
    spf_x = timed_frames(
        lambda i: engx.render(bench.camera_uniforms(engx.uniforms, i)),
        args.frames, timeout_s=600)
    check("mosaic_opaque_parity", cfrac == 0.0 and dfrac == 0.0,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          pallas_ms=round(spf_p * 1e3, 2), xla_ms=round(spf_x * 1e3, 2),
          pallas_beats_xla=spf_p < spf_x)

    # ---- 2. depth-peeled K-buffer parity --------------------------------
    stage("kbuffer_parity")
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
        args.frames, timeout_s=600)
    check(f"mosaic_kbuffer{K}_parity", cfrac == 0.0 and dfrac == 0.0,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          kbuffer_ms=round(spf_k * 1e3, 2))

    # ---- 3. Mesh((1,1)) sharded kernel == unsharded, near-zero overhead -
    stage("sharded_mesh11")
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
            args.frames, timeout_s=600)
    cmax = float(np.abs(cs - cp).max())
    dmax = float(np.abs(ds - dp).max())
    ratio = spf_s / spf_p
    check("sharded_mesh11_kernel", cmax == 0.0 and dmax == 0.0
          and ratio <= TIME_RATIO,
          color_max_diff=cmax, depth_max_diff=dmax,
          sharded_ms=round(spf_s * 1e3, 2),
          unsharded_ms=round(spf_p * 1e3, 2), ratio=round(ratio, 3))

    # ---- 4. golden subset through the Mosaic kernel ---------------------
    stage("goldens")
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
    stage("active_cap")
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

    # ---- 5b. capacity truncations (pair_cap / global_cap / lazy) --------
    stage("capacity_caps")
    # The full capacity stack through the real kernel: lazy compaction
    # (default-on above), live-pair table truncation and global-stream
    # truncation must stay bit-identical to the uncapped frame with every
    # overflow counter at 0.  Caps are sized from the measured counters
    # (the documented workflow).
    engm = Engine(sc, RenderParams(width=640, height=360,
                                   active_cap_stats=True))
    _, _, st0 = engm.render(uu)
    pair_cap = -(-int(st0["live_pairs"]) * 5 // 4 // 128) * 128
    glob_cap = max(256, int(st0["live_globals"]) * 2)
    engt = Engine(sc, RenderParams(width=640, height=360, active_cap=cap,
                                   geom_cap=lod_mod.suggested_geom_cap(sc),
                                   pair_cap=pair_cap, global_cap=glob_cap,
                                   active_cap_stats=True))
    ct, dt, st = engt.render(uu)
    ct, dt = np.asarray(ct), np.asarray(dt)
    overflow = {k: int(v) for k, v in st.items() if k.endswith("overflow")}
    cfrac = float((np.abs(c0 - ct).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(d0 - dt) > 1e-5).mean())
    check("mosaic_capacity_caps_parity",
          cfrac == 0.0 and dfrac == 0.0
          and all(v == 0 for v in overflow.values()),
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          pair_cap=pair_cap, global_cap=glob_cap,
          geom_cap=lod_mod.suggested_geom_cap(sc),
          live_pairs=int(st0["live_pairs"]),
          live_globals=int(st0["live_globals"]), **overflow)

    # ---- 6. skeletal skinning (level-scheduled FK) parity on Mosaic -----
    stage("skinning")
    # Three two-bone arms with a per-skin anim_time vector: the Mosaic
    # kernel frame must match the XLA fused frame pixel-exactly, and the
    # pose must actually move with the clock (guards the level-FK
    # lowering + per-instance clocks on the real compilation).
    from softwarerenderer_tpu.models.scene import Skin
    from softwarerenderer_tpu.utils import mathlib as ml2

    def arm():
        pos = np.asarray([[0, 0, 0], [2, 0, 0], [0, 1, 0], [2, 1, 0]],
                         np.float32)
        mesh = {"position": pos, "uv": np.zeros((4, 2), np.float32),
                "normal": np.tile(np.float32([[0, 0, 1]]), (4, 1)),
                "color": np.ones((4, 4), np.float32),
                "indices": np.asarray([[0, 1, 2], [2, 1, 3]], np.int32)}
        child = (pos[:, 0] >= 1.0).astype(np.int32)
        joints = np.stack([child] + [np.zeros_like(child)] * 3, -1)
        weights = np.zeros((4, 4), np.float32)
        weights[:, 0] = 1.0
        qid = np.float32([0, 0, 0, 1])
        q90 = np.asarray(ml2.quat_from_axis_angle([0, 0, 1], np.pi / 2),
                         np.float32)
        trans = np.zeros((2, 2, 3), np.float32)
        trans[:, 1, 0] = 1.0
        skin = Skin(joints=joints, weights=weights,
                    parent=np.asarray([-1, 0], np.int32),
                    inverse_bind=np.stack([
                        np.eye(4, dtype=np.float32),
                        np.asarray(ml2.translation([-1, 0, 0]),
                                   np.float32)]),
                    trans=trans,
                    rot=np.stack([np.stack([qid, qid]),
                                  np.stack([qid, q90])], axis=1),
                    scale=np.ones((2, 2, 3), np.float32), rate=1.0)
        return mesh, skin

    sk_insts = []
    for i in range(3):
        m, s = arm()
        sk_insts.append(scene_mod.MeshInstance(
            m, ml2.translation([-3.0 + 2.2 * i, -0.5, -5.0]), skin=s))
    sk_sc = scene_mod.build_scene_buffers(sk_insts)
    engsm = Engine(sk_sc, RenderParams(width=320, height=200,
                                       cull_mode=0))
    engsf = Engine(sk_sc, RenderParams(width=320, height=200, cull_mode=0,
                                       use_pallas=False))
    uu = dict(engsm.uniforms)
    uu["anim_time"] = np.float32([0.0, 0.5, 1.0])
    csm, dsm = map(np.asarray, engsm.render(uu))
    csf, dsf = map(np.asarray, engsf.render(uu))
    cfrac = float((np.abs(csm - csf).max(axis=-1) > 1e-5).mean())
    dfrac = float((np.abs(dsm - dsf) > 1e-5).mean())
    u0 = dict(uu)
    u0["anim_time"] = np.float32([0.0, 0.0, 0.0])
    c00 = np.asarray(engsm.render(u0)[0])
    moved = int((np.abs(csm - c00).max(axis=-1) > 0.05).sum())
    check("mosaic_skinned_parity", cfrac == 0.0 and dfrac == 0.0
          and moved > 20,
          color_mismatch_frac=cfrac, depth_mismatch_frac=dfrac,
          pixels_moved_by_clock=moved)

    # ---- 7. morph targets (animated weight track) parity on Mosaic ------
    stage("morph")
    # A two-target quad with a weight track: the Mosaic kernel frame must
    # match XLA fused pixel-exactly and the silhouette must move with the
    # anim_time clock (guards the ops/morph vertex stage on the real
    # compilation).
    mdp = np.zeros((2, 4, 3), np.float32)
    mdp[0, :, 2] = [0.0, 1.0, 2.0, 3.0]
    mdp[1, :, 0] = 1.0
    mtrack = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    mmesh = {"position": np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                                     [1, 1, 0]], np.float32),
             "uv": np.zeros((4, 2), np.float32),
             "normal": np.tile(np.float32([[0, 0, 1]]), (4, 1)),
             "color": np.ones((4, 4), np.float32),
             "indices": np.asarray([[0, 1, 2], [2, 1, 3]], np.int32)}
    mo_sc = scene_mod.build_scene_buffers([scene_mod.MeshInstance(
        mmesh, ml2.translation([-0.5, -0.5, -4.0]),
        morph={"pos": mdp, "nrm": None,
               "weights": np.zeros(2, np.float32),
               "weight_track": mtrack, "rate": 1.0})])
    engmm = Engine(mo_sc, RenderParams(width=320, height=200,
                                       cull_mode=0))
    engmf = Engine(mo_sc, RenderParams(width=320, height=200, cull_mode=0,
                                       use_pallas=False))
    um = dict(engmm.uniforms)
    um["anim_time"] = np.float32(0.5)
    cmm, dmm = map(np.asarray, engmm.render(um))
    cmf, dmf = map(np.asarray, engmf.render(um))
    mcfrac = float((np.abs(cmm - cmf).max(axis=-1) > 1e-5).mean())
    mdfrac = float((np.abs(dmm - dmf) > 1e-5).mean())
    um0 = dict(um)
    um0["morph_weights"] = np.zeros((1, 2), np.float32)
    cm0 = np.asarray(engmm.render(um0)[0])
    mmoved = int((np.abs(cmm - cm0).max(axis=-1) > 0.05).sum())
    check("mosaic_morph_parity", mcfrac == 0.0 and mdfrac == 0.0
          and mmoved > 20,
          color_mismatch_frac=mcfrac, depth_mismatch_frac=mdfrac,
          pixels_moved_by_clock=mmoved)

    # ---- 8. balanced='rows' through the Pallas kernel (r4) --------------
    # The occupancy-balanced Mesh((1,1)) frame must be bit-identical to
    # the unsharded kernel frame and within a bounded ratio of its time —
    # the single-chip proof that load-balanced sharding now runs the
    # same kernel architecture (tile-row map via scalar prefetch).
    # Balanced mode needs height % tile_h == 0, so this check runs at
    # 1920×1088 (1080 is not a 32 multiple) with its own reference.
    stage("balanced_rows_kernel")
    Hb = 1088
    params_b = RenderParams(width=W, height=Hb, use_pallas=True)
    engb = Engine(scene, params_b)
    cbu, dbu = map(np.asarray, engb.render(u))
    spf_bu = timed_frames(
        lambda i: engb.render(bench.camera_uniforms(engb.uniforms, i)),
        args.frames, timeout_s=600)
    with mesh:
        balanced = jax.jit(functools.partial(
            render_frame_sharded, params=params_b, mesh=mesh,
            balanced=True))
        cb, db = map(np.asarray, balanced(sscene, u))
        spf_b = timed_frames(
            lambda i: balanced(sscene,
                               bench.camera_uniforms(engb.uniforms, i)),
            args.frames, timeout_s=600)
    cmax = float(np.abs(cb - cbu).max())
    dmax = float(np.abs(db - dbu).max())
    bratio = spf_b / spf_bu
    check("balanced_rows_kernel", cmax == 0.0 and dmax == 0.0
          and bratio <= 1.35,
          color_max_diff=cmax, depth_max_diff=dmax,
          balanced_ms=round(spf_b * 1e3, 2),
          unsharded_ms=round(spf_bu * 1e3, 2), ratio=round(bratio, 3))

    # ---- 9. ray-trace pair-table winners vs brute on-device (r4) --------
    # The pair-table bundle raycast (ops/rt_accel) must reproduce the
    # brute raycast's winner identity (hit, tri) EXACTLY on the real
    # compilation — the rt_accel contract, here on hardware.
    stage("rt_pair_winners")
    import importlib

    from softwarerenderer_tpu.ops import rt_accel
    rc = importlib.import_module("softwarerenderer_tpu.sim.raycast")
    rngs = np.random.default_rng(5)
    n_soup = 1003
    base = rngs.uniform(-10, 10, (n_soup, 3)).astype(np.float32)
    v = base[:, None, :] + rngs.uniform(-0.8, 0.8,
                                        (n_soup, 3, 3)).astype(np.float32)
    soup = {"mesh_matrices": np.eye(4, dtype=np.float32)[None],
            "vert_mesh_id": np.zeros((3 * n_soup,), np.int32),
            "position": v.reshape(-1, 3),
            "normal": np.tile(np.float32([[0, 1, 0]]), (3 * n_soup, 1)),
            "indices": np.arange(3 * n_soup,
                                 dtype=np.int32).reshape(-1, 3),
            "tri_mesh_id": np.zeros((n_soup,), np.int32)}
    world_r = rc.build_collision_world(jax.device_put(soup))
    accel_r = rt_accel.build_rt_accel(world_r, group=32)
    B_r, R_r = 24, 128     # kernel lane alignment: R must be a 128 mult
    o_r = np.repeat(rngs.uniform(-0.5, 0.5, (B_r, 1, 3)).astype(
        np.float32) + [-12, 0, 0], R_r, axis=1)
    d_r = (np.float32([1, 0, 0])
           + rngs.uniform(-0.3, 0.3, (B_r, R_r, 3)).astype(np.float32))
    from softwarerenderer_tpu.ops import rt_pallas
    accel_k = rt_pallas.build_rt_accel_pl(world_r)
    res = jax.jit(lambda o, d: rt_accel.raycast_bundles_nearest(
        o, d, world_r, accel_r, pair_cap=B_r * 64))(o_r, d_r)
    resk = jax.jit(lambda o, d: rt_pallas.raycast_bundles_nearest_pl(
        o, d, world_r, accel_k))(o_r, d_r)
    anyk = jax.jit(lambda o, d: rt_pallas.raycast_bundles_any_pl(
        o, d, world_r, accel_k))(o_r, d_r)
    mism = kmism = 0
    for b in range(B_r):
        brute = rc.raycast_batch(o_r[b], d_r[b], world_r,
                                 face_mask=rc.FACE_MASK_NONE)
        mism += int((np.asarray(res["hit"][b])
                     != np.asarray(brute["hit"])).sum())
        mism += int((np.asarray(res["tri"][b])
                     != np.asarray(brute["tri"])).sum())
        kmism += int((np.asarray(resk["hit"][b])
                      != np.asarray(brute["hit"])).sum())
        kmism += int((np.asarray(resk["tri"][b])
                      != np.asarray(brute["tri"])).sum())
        kmism += int((np.asarray(anyk["hit"][b])
                      != np.asarray(brute["hit"])).sum())
    check("rt_pair_winners",
          mism == 0 and kmism == 0
          and not bool(res["overflow"]) and not bool(resk["overflow"]),
          xla_winner_mismatches=mism, kernel_winner_mismatches=kmism,
          n_pairs=int(res["n_pairs"]),
          xla_overflow=bool(res["overflow"]),
          kernel_overflow=bool(resk["overflow"]))

    if wd_state["cancel"] is not None:
        wd_state["cancel"]()
    ok = all(c["ok"] for c in checks)
    out = {"ok": ok, "device": str(jax.devices()[0].device_kind),
           "time": time.strftime("%Y-%m-%dT%H:%M:%S"), "checks": checks}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"tpu_ci_ok": ok, "artifact": args.out}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
