"""Batched AI agents: N characters stepped in ONE jitted program.

Beyond the reference (which has no AI — every ConnectedPlayer is a
human, /root/reference/Renderer.cs:62-70), but built entirely from its
pieces: each agent is the reference's kinematic capsule controller
(CharacterController.cs, re-designed as the pure `character_step`) plus
a tiny waypoint-seeking brain, and the whole crowd advances with one
`jax.vmap`ped call — steering, the 9-ray ground probes, and every
capsule slide shell for ALL agents fuse into a single device program
(SURVEY.md §2.2 P5 taken to N characters).  This is the TPU-first
answer to "add bots": the cost of one more bot is one more row in a
batch, not another thread.

Brain (deliberately simple, masked arithmetic only):
  * head toward `waypoints[waypoint_idx]` on the XZ plane
  * within `arrive_radius` → advance to a PRNG-chosen next waypoint
  * grounded and barely moving for `stuck_time` seconds while far from
    the goal → jump (the Quake-style controller steps up low obstacles
    by itself; the jump unsticks taller lips)
PRNG state (`key`) lives in the agent state, so trajectories are
deterministic and checkpoint/replay-safe like the particle system.

dust2 hosts expose this as `--bots N`: bots join the session as
ordinary players (buffered ConnectedPlayer + per-frame Update RPCs on
the reference's wire protocol), so remote reference-shaped clients
render and shoot them like humans.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from softwarerenderer_tpu.sim.character import (
    DEFAULT_SLIDE_H_RAYS,
    DEFAULT_SLIDE_V_STEPS,
    character_step,
    initial_character_state,
)
from softwarerenderer_tpu.sim.raycast import raycast_batch

F32 = jnp.float32


def default_brain_params() -> Dict:
    """Steering tunables (traced, like the character params)."""
    return {
        "arrive_radius": np.float32(1.2),    # waypoint reached within this
        "stuck_speed": np.float32(0.35),     # XZ speed below this = stuck
        "stuck_time": np.float32(0.5),       # seconds below it before a jump
        "move_scale": np.float32(1.0),       # 0..1 throttle on move_input
        # Give up on an unreached waypoint after this many seconds (a
        # scattered goal can be unreachable — behind a wall, off the
        # walkable area); patience keeps the crowd from deadlocking.
        "patience": np.float32(6.0),
    }


def initial_agents_state(positions, key=None, waypoint_idx=None) -> Dict:
    """Batched agent state for positions (N, 3).

    `waypoint_idx` (N,) selects each agent's first goal (default 0);
    `key` seeds the steering PRNG (split into one key PER AGENT, so a
    batch of N agents steps bit-identically to N separate batches of 1
    — tested in tests/test_agents.py)."""
    positions = jnp.asarray(positions, F32)
    n = positions.shape[0]
    char = jax.vmap(initial_character_state)(positions)
    if key is None:
        key = jax.random.PRNGKey(0)
    if waypoint_idx is None:
        waypoint_idx = jnp.zeros((n,), jnp.int32)
    return {
        "char": char,
        "waypoint": jnp.asarray(waypoint_idx, jnp.int32),
        "wp_age": jnp.zeros((n,), F32),
        "slow_time": jnp.zeros((n,), F32),
        "key": jax.random.split(key, n),                   # (N, 2)
        # facing quaternion [x,y,z,w] per agent, yaw-only (players render
        # bots through the same quat slot as human Updates)
        "rotation": jnp.tile(jnp.asarray([0, 0, 0, 1], F32), (n, 1)),
    }


def agents_step(state: Dict, dt, waypoints, world: Dict,
                char_params: Dict, brain: Dict, tri_mask=None,
                slide_v_steps: int = DEFAULT_SLIDE_V_STEPS,
                slide_h_rays: int = DEFAULT_SLIDE_H_RAYS) -> Dict:
    """Advance every agent one tick; returns the new state.

    waypoints: (W, 3) patrol targets shared by all agents (W ≥ 1).
    All other args match `character_step`."""
    waypoints = jnp.asarray(waypoints, F32)
    dt = jnp.asarray(dt, F32)
    pos = state["char"]["position"]                     # (N, 3)
    n = pos.shape[0]
    n_wp = waypoints.shape[0]

    # --- steering ---------------------------------------------------------
    target = jnp.take(waypoints, state["waypoint"], axis=0)   # (N, 3)
    delta = (target - pos).at[:, 1].set(0.0)
    dist = jnp.linalg.norm(delta, axis=1)                     # (N,)
    arrived = dist < brain["arrive_radius"]
    age = state["wp_age"] + dt
    switch = arrived | (age > brain["patience"])   # reached OR gave up

    # Per-agent PRNG: state["key"] is (N, 2); split each agent's key so
    # agent i's stream is independent of the batch it rides in.
    split3 = jax.vmap(lambda k: jax.random.split(k, 3))(state["key"])
    key, k_adv, k_jump = split3[:, 0], split3[:, 1], split3[:, 2]
    if n_wp > 1:
        advance = jax.vmap(
            lambda k: jax.random.randint(k, (), 1, n_wp))(k_adv)  # 1..W-1
        next_wp = (state["waypoint"] + advance) % n_wp
    else:
        next_wp = state["waypoint"]
    waypoint = jnp.where(switch, next_wp, state["waypoint"])
    wp_age = jnp.where(switch, 0.0, age)

    safe = jnp.maximum(dist, 1e-6)[:, None]
    move_dir = delta / safe                                   # (N, 3) unit XZ
    move_input = jnp.where(arrived[:, None], 0.0,
                           move_dir * brain["move_scale"])

    # Unstick: blocked below stuck_speed of ACTUAL movement for
    # stuck_time seconds → jump.  slow_time accumulated LAST frame from
    # real displacement (the controller keeps its commanded velocity
    # when a slide blocks all movement, so velocity is a lie here);
    # dither so a whole wall-hugging crowd doesn't pogo in sync.
    stuck = ~arrived & (state["slow_time"] >= brain["stuck_time"])
    jump = stuck & (jax.vmap(
        lambda k: jax.random.uniform(k, ()))(k_jump) < 0.5)

    # Facing: rotate [0,0,-1] by yaw to the move direction
    # (dust2 builds human Update quats the same way, apps/dust2.py).
    yaw = jnp.arctan2(-move_dir[:, 0], -move_dir[:, 2])
    half = 0.5 * yaw
    quat = jnp.stack([jnp.zeros(n, F32), jnp.sin(half),
                      jnp.zeros(n, F32), jnp.cos(half)], axis=1)
    rotation = jnp.where(arrived[:, None], state["rotation"], quat)

    # --- physics: every agent's controller step in one vmap ---------------
    char = jax.vmap(
        lambda s, m, j: character_step(
            s, m, j, dt, world, char_params, tri_mask=tri_mask,
            slide_v_steps=slide_v_steps, slide_h_rays=slide_h_rays)
    )(state["char"], move_input, jump)

    # Accumulate the stuck streak from the step's real XZ displacement.
    disp = char["position"] - pos
    speed_xz = jnp.linalg.norm(disp[:, (0, 2)], axis=1) / jnp.maximum(
        dt, 1e-6)
    slow_now = (char["grounded"] & ~arrived
                & (speed_xz < brain["stuck_speed"]))
    slow_time = jnp.where(slow_now & ~jump, state["slow_time"] + dt, 0.0)

    return {"char": char, "waypoint": waypoint, "wp_age": wp_age,
            "slow_time": slow_time, "key": key, "rotation": rotation}


def respawn_agent(state: Dict, index, position) -> Dict:
    """Teleport one agent (bot respawn after a kill): zero its velocity
    and place it at `position`.  Host-side index may be traced or int."""
    position = jnp.asarray(position, F32)
    char = dict(state["char"])
    char["position"] = state["char"]["position"].at[index].set(position)
    char["velocity"] = state["char"]["velocity"].at[index].set(0.0)
    return {**state, "char": char,
            "wp_age": state["wp_age"].at[index].set(0.0),
            "slow_time": state["slow_time"].at[index].set(0.0)}


def scatter_waypoints_on_floor(world: Dict, centers, n_points: int,
                               seed: int = 0, height: float = 30.0,
                               radius: float = 12.0,
                               tri_mask=None) -> np.ndarray:
    """Build a walkable waypoint set by dropping rays onto the map floor.

    Samples `n_points` XZ offsets around each center, raycasts straight
    down (one batched Möller–Trumbore wave, sim/raycast.py), and keeps
    the hit points; centers themselves are always included.  Host-side
    setup helper (runs once), returns (W, 3) float32 on host."""
    centers = np.atleast_2d(np.asarray(centers, np.float32))
    rng = np.random.default_rng(seed)
    offs = rng.uniform(-radius, radius, size=(len(centers), n_points, 2))
    starts = np.repeat(centers[:, None, :], n_points, axis=1).copy()
    starts[..., 0] += offs[..., 0]
    starts[..., 2] += offs[..., 1]
    starts[..., 1] += height
    origins = starts.reshape(-1, 3)
    dirs = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32),
                   (len(origins), 1))
    res = jax.device_get(
        raycast_batch(jnp.asarray(origins), jnp.asarray(dirs), world,
                      tri_mask=tri_mask))
    floor = res["point"][np.asarray(res["hit"], bool)]
    return np.concatenate([centers, np.asarray(floor, np.float32)], axis=0)
