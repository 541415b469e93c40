"""Quake-style kinematic character controller as a pure jittable step.

Re-designs CharacterController (/root/reference/CharacterController.cs) —
a capsule built entirely on raycasts — as a pure function
(state, input, world) → state with static shapes:

  * the 9-ray ground/ceiling probe (CheckPlane, :228-306) and the capsule
    ray shell of MoveWithSlide (:308-393) become BATCHED raycast waves (all
    rays × all triangles in one tensor op — SURVEY.md §2.2 P5)
  * the ≤3-deep slide recursion becomes a fixed 3-iteration fori_loop with
    a done flag (SURVEY.md §7 hard-part (e))
  * every branch (jump, ground snap, ceiling bonk, friction vs air accel)
    becomes masked arithmetic, so the whole step fuses into the frame
    program (BASELINE config 4: physics-coupled sim+render in one jit)

Tunables mirror the reference's defaults (CharacterController.cs:21-33)
and live in a TRACED params dict, so the ImGui-style live tuning never
recompiles.  Faithfulness notes:
  * ActualStepSize is frame-carried state: the ground-snap slide uses last
    frame's value; the horizontal slide uses this frame's (:93-108, 325)
  * ray counts replicate the reference's formulas: verticalSteps =
    max(1, Height/(2·radius)), horizontalRays = max(4, 4π·radius/0.1)
    (:330-331) — static ints computed from the DEFAULT height/radius since
    shapes must be static; retune `slide_v_steps`/`slide_h_rays` if those
    change materially
  * CheckPlane hits count only within |velocity.y·dt| + Height (:257-259)
  * slide: stop when |dir·normal| > 0.9, else deflect along
    cross(n, cross(remaining, n)) scaled to |remaining| (:375-391)
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from softwarerenderer_tpu.sim.raycast import raycast_batch
from softwarerenderer_tpu.utils import mathlib as ml

F32 = jnp.float32
NEG_INF = np.float32(-np.inf)  # host scalar (no import-time backend init)

# CheckPlane's 3×3 ring of probe offsets (CharacterController.cs:238-249).
_PROBE_OFFSETS = np.array(
    [[0, 0, 0], [-1, 0, 0], [1, 0, 0], [0, 0, -1], [0, 0, 1],
     [-1, 0, -1], [-1, 0, 1], [1, 0, -1], [1, 0, 1]], dtype=np.float32)

# Default capsule → default ray-shell shape (CharacterController.cs:330-331
# with Height=0.5, radius=Radius+0.001=0.151).
DEFAULT_SLIDE_V_STEPS = max(1, int(0.5 / (0.151 * 2)))      # = 1
DEFAULT_SLIDE_H_RAYS = max(4, int(4 * math.pi * 0.151 / 0.1))  # = 18


def default_character_params() -> Dict:
    """Reference tunables (CharacterController.cs:21-33) as traced values."""
    return {
        "gravity": np.asarray([0.0, -14.0, 0.0], np.float32),
        "height": np.float32(0.5),
        "radius": np.float32(0.15),
        "step_size": np.float32(0.3),
        "move_speed": np.float32(5.0),
        "jump_force": np.float32(4.0),
        "ground_acceleration": np.float32(3.5),
        "air_acceleration": np.float32(0.35),
        "max_air_speed": np.float32(6.0),
        "ground_friction": np.float32(6.0),
        "air_control": np.float32(0.2),
        "cam_offset": np.asarray([0.0, 0.15, 0.0], np.float32),
    }


def initial_character_state(position) -> Dict:
    return {
        "position": jnp.asarray(position, dtype=F32),
        "velocity": jnp.zeros(3, dtype=F32),
        "grounded": jnp.asarray(False),
        "ceiling": jnp.asarray(False),
        "jump_cooldown": jnp.asarray(0.0, dtype=F32),
        "actual_step": jnp.asarray(0.03, dtype=F32),  # initial field value
        "noclip": jnp.asarray(False),
    }


def _project_on_plane(v, n):
    """CharacterController.ProjectOnPlane (:142-155): v - (v·n)n/|n|²,
    passthrough when |n|² < 1e-6."""
    nsq = jnp.sum(n * n)
    dot = jnp.sum(v * n)
    proj = v - dot * n / jnp.where(nsq == 0, F32(1), nsq)
    return jnp.where(nsq < F32(1e-6), v, proj)


def _check_plane(pos, velocity, dt, direction, world, params, tri_mask):
    """9-ray vertical probe (CheckPlane, :228-306) as one batched raycast.

    Returns (any_hit, point, normal)."""
    offsets = jnp.asarray(_PROBE_OFFSETS)
    norm_off = ml.safe_normalize(offsets, xp=jnp) \
        * (params["radius"] - F32(0.01))
    height_off = jnp.asarray([0.0, 1.0, 0.0], F32) * F32(direction) \
        * (params["height"] * F32(0.5) - F32(0.01))

    frame_delta = jnp.asarray([0.0, 1.0, 0.0], F32) * velocity[1] * dt
    starts = pos[None] + norm_off - height_off[None]
    ends = pos[None] + frame_delta[None] + norm_off + height_off[None]
    dirs = ends - starts
    ray_ok = jnp.sum(dirs * dirs, axis=-1) >= F32(1e-4)

    out = raycast_batch(starts, dirs, world, tri_mask=tri_mask)
    max_distance = jnp.abs(frame_delta[1]) + params["height"]
    valid = out["hit"] & ray_ok & (out["distance"] <= max_distance)

    big = jnp.finfo(jnp.float32).max
    dist = jnp.where(valid, out["distance"], big)
    best = jnp.argmin(dist)
    any_hit = jnp.any(valid)
    point = jnp.where(any_hit, out["point"][best],
                      jnp.full(3, NEG_INF))
    normal = jnp.where(any_hit, out["normal"][best],
                       jnp.asarray([0.0, 1.0, 0.0], F32))
    return any_hit, point, normal


def _move_with_slide(current, desired, radius, actual_step, world, params,
                     tri_mask, v_steps: int, h_rays: int):
    """Recursive slide (MoveWithSlide, :308-393) as a 3-iteration loop.

    The capsule shell: (v_steps+1) height levels lerped from
    (-h/2 + actual_step) to +h/2, × h_rays points on the radius circle.
    """
    half_h = params["height"] * F32(0.5)
    vi = jnp.arange(v_steps + 1, dtype=F32) / F32(max(1, v_steps))
    bottom = -half_h + actual_step
    heights = bottom + (half_h - bottom) * vi                  # (V,)
    angles = (2.0 * np.pi) * jnp.arange(h_rays, dtype=F32) / F32(h_rays)
    ring = jnp.stack([radius * jnp.cos(angles),
                      jnp.zeros_like(angles),
                      radius * jnp.sin(angles)], axis=-1)      # (H, 3)
    shell = (jnp.zeros((v_steps + 1, 1, 3), F32)
             .at[:, :, 1].add(heights[:, None])
             + ring[None]).reshape(-1, 3)                      # (R, 3)

    def body(_, carry):
        cur, des, done = carry
        move = des - cur
        move_dist = jnp.sqrt(jnp.sum(move * move))
        direction = move / jnp.where(move_dist == 0, F32(1), move_dist)

        origins = cur[None] + shell
        dirs = jnp.broadcast_to(direction, origins.shape)
        out = raycast_batch(origins, dirs, world, tri_mask=tri_mask)
        hit_ok = out["hit"] & (out["distance"] < move_dist)
        big = jnp.finfo(jnp.float32).max
        dist = jnp.where(hit_ok, out["distance"], big)
        best = jnp.argmin(dist)
        collided = jnp.any(hit_ok) & (move_dist > 0)
        nearest = jnp.where(collided, dist[best], move_dist)
        hit_normal = ml.safe_normalize(out["normal"][best], xp=jnp)

        safe_stop = cur + direction * (nearest - F32(0.001))
        remaining = des - safe_stop
        alignment = jnp.sum(direction * hit_normal)
        blocked = jnp.abs(alignment) > F32(0.9)

        slide_dir = ml.cross(hit_normal,
                             ml.cross(remaining, hit_normal, xp=jnp), xp=jnp)
        slide_zero = jnp.all(slide_dir == 0)
        rem_len = jnp.sqrt(jnp.sum(remaining * remaining))
        slide_target = safe_stop + ml.safe_normalize(slide_dir, xp=jnp) \
            * rem_len

        # No collision → arrive; blocked/zero-slide → stop at safe point;
        # else continue sliding next iteration.
        new_done = done | ~collided | blocked | slide_zero
        new_cur = jnp.where(done, cur,
                            jnp.where(collided, safe_stop, des))
        new_des = jnp.where(done | ~collided, new_cur,
                            jnp.where(blocked | slide_zero, new_cur,
                                      slide_target))
        return new_cur, new_des, new_done

    cur, des, done = jax.lax.fori_loop(
        0, 3, body, (current, desired, jnp.asarray(False)))
    # If still sliding after 3 attempts, the reference returns currentPos
    # (depth cap, :320-322): that's `cur` here.
    return jnp.where(done, cur, cur)


def character_step(state: Dict, move_input, jump_requested, dt,
                   world: Dict, params: Dict, tri_mask=None,
                   slide_v_steps: int = DEFAULT_SLIDE_V_STEPS,
                   slide_h_rays: int = DEFAULT_SLIDE_H_RAYS) -> Dict:
    """One controller update (CharacterController.Update, :50-140)."""
    dt = jnp.asarray(dt, dtype=F32)
    move_input = jnp.asarray(move_input, dtype=F32)
    jump_requested = jnp.asarray(jump_requested, bool)

    pos0 = state["position"]
    vel0 = state["velocity"]

    # --- noclip branch (:52-61), selected at the end -----------------------
    nc_len = jnp.sqrt(jnp.sum(move_input * move_input))
    nc_dir = jnp.where(nc_len > 1, move_input / jnp.where(nc_len == 0,
                                                          F32(1), nc_len),
                       move_input)
    nc_vel = nc_dir * params["move_speed"]
    nc_pos = pos0 + nc_vel * dt

    # --- physics path ------------------------------------------------------
    mi = move_input.at[1].set(0.0)
    vel = vel0 + params["gravity"] * dt
    cooldown = jnp.where(state["jump_cooldown"] > 0,
                         state["jump_cooldown"] - dt,
                         state["jump_cooldown"])

    do_jump = jump_requested & state["grounded"] & (cooldown <= 0)
    vel = jnp.where(do_jump, vel.at[1].set(params["jump_force"]), vel)
    cooldown = jnp.where(do_jump, F32(0.25), cooldown)

    # The reference sets IsGrounded=False on jump then immediately
    # recomputes it from CheckPlane (:85-87) — only the recompute persists.
    grounded, ground_point, ground_normal = _check_plane(
        pos0, vel, dt, -1.0, world, params, tri_mask)

    movement = vel * dt
    move_xz = _project_on_plane(movement.at[1].set(0.0), ground_normal)

    ceiling, _, _ = _check_plane(pos0, vel, dt, 1.0, world, params, tri_mask)

    # Ground response (:93-108)
    radius = params["radius"] + F32(0.001)
    snap_cond = grounded & jnp.all(ground_point != NEG_INF) & (cooldown <= 0)
    snap_target = pos0.at[1].set(ground_point[1]
                                 + params["height"] * F32(0.5))
    snapped = _move_with_slide(pos0, snap_target, radius,
                               state["actual_step"], world, params, tri_mask,
                               slide_v_steps, slide_h_rays)
    pos = jnp.where(snap_cond, snapped, pos0)
    vel = jnp.where(snap_cond & (vel[1] < 0), vel.at[1].set(0.0), vel)
    actual_step = jnp.where(snap_cond, params["step_size"], F32(0.0))

    # Ceiling response (:111-115)
    bonk = ceiling & (vel[1] > 0)
    vel = jnp.where(bonk, vel.at[1].set(0.0), vel)
    cooldown = jnp.where(bonk, F32(0.0), cooldown)

    # Horizontal slide (:118) + vertical integration (:121)
    pos = _move_with_slide(pos, pos + move_xz, radius, actual_step, world,
                           params, tri_mask, slide_v_steps, slide_h_rays)
    pos = pos + jnp.asarray([0.0, 1.0, 0.0], F32) * vel[1] * dt

    # Acceleration (:124-139)
    wish_dir = _project_on_plane(mi, ground_normal)
    wish_speed = jnp.sqrt(jnp.sum(wish_dir * wish_dir))
    wish_dir = jnp.where(wish_speed > 1,
                         wish_dir / jnp.where(wish_speed == 0, F32(1),
                                              wish_speed), wish_dir)
    wish_speed = wish_speed * params["move_speed"]

    hvel = vel.at[1].set(0.0)
    speed = jnp.sqrt(jnp.sum(hvel * hvel))

    # ApplyFriction (:160-175)
    drop = speed * params["ground_friction"] * dt
    new_speed = jnp.maximum(speed - drop, 0)
    scale = new_speed / jnp.where(speed == 0, F32(1), speed)
    fric_vel = jnp.stack([jnp.where(speed < 0.1, 0.0, vel[0] * scale),
                          vel[1],
                          jnp.where(speed < 0.1, 0.0, vel[2] * scale)])

    # GroundAccelerate (:177-187) applied to the post-friction velocity
    fh = fric_vel.at[1].set(0.0)
    cur_speed_g = jnp.sum(fh * wish_dir)
    add_g = wish_speed - cur_speed_g
    accel_g = jnp.minimum(params["ground_acceleration"] * wish_speed * dt,
                          add_g)
    ground_vel = jnp.where(
        add_g > 0,
        fric_vel + jnp.stack([wish_dir[0] * accel_g, F32(0.0),
                              wish_dir[2] * accel_g]),
        fric_vel)

    # AirAccelerate (:189-209)
    ah = vel.at[1].set(0.0)
    cur_speed_a = jnp.sum(ah * wish_dir)
    add_a = wish_speed - cur_speed_a
    accel_a = jnp.minimum(params["air_acceleration"] * wish_speed * dt,
                          add_a)
    projected = ah + wish_dir * accel_a
    plen = jnp.sqrt(jnp.sum(projected * projected))
    over = plen > params["max_air_speed"]
    proj_clamped = ml.safe_normalize(projected, xp=jnp) \
        * params["max_air_speed"]
    air_vel = jnp.where(
        add_a > 0,
        jnp.where(over,
                  jnp.stack([proj_clamped[0], vel[1], proj_clamped[2]]),
                  vel + jnp.stack([wish_dir[0] * accel_a, F32(0.0),
                                   wish_dir[2] * accel_a])),
        vel)

    # AirControlFunc (:211-226)
    ac_h = air_vel.at[1].set(0.0)
    ac_speed = jnp.sqrt(jnp.sum(ac_h * ac_h))
    k = params["air_control"] * dt
    ac_apply = (jnp.sum(wish_dir * wish_dir) >= F32(0.001)) \
        & (ac_speed >= F32(0.1))
    air_vel = jnp.where(
        ac_apply,
        air_vel + jnp.stack([wish_dir[0] * k, F32(0.0), wish_dir[2] * k]),
        air_vel)

    # ClampAirSpeed (:199-209 via :137)
    ch = air_vel.at[1].set(0.0)
    cs = jnp.sqrt(jnp.sum(ch * ch))
    clamped = ml.safe_normalize(ch, xp=jnp) * params["max_air_speed"]
    air_vel = jnp.where(cs > params["max_air_speed"],
                        jnp.stack([clamped[0], air_vel[1], clamped[2]]),
                        air_vel)

    vel = jnp.where(grounded, ground_vel, air_vel)

    noclip = state["noclip"]
    return {
        "position": jnp.where(noclip, nc_pos, pos),
        "velocity": jnp.where(noclip, nc_vel, vel),
        "grounded": jnp.where(noclip, state["grounded"], grounded),
        "ceiling": jnp.where(noclip, state["ceiling"], ceiling),
        "jump_cooldown": jnp.where(noclip, state["jump_cooldown"], cooldown),
        "actual_step": jnp.where(noclip, state["actual_step"], actual_step),
        "noclip": noclip,
    }
