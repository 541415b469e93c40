"""Device-side particle system: emission, integration and camera-facing
billboards inside the jitted frame program.

Beyond the reference (OCSYT/SoftwareRenderer has no particle system), but
built the way this framework builds everything the reference DOES have:
the whole simulate→billboard→rasterize path is one XLA program per frame
(SURVEY.md §2.2's "sim on device" stance, like sim/character.py), with
static shapes throughout:

  * a fixed CAPACITY ring buffer of particle slots — emission writes the
    next k slots each step (k traced, bounded by a static max), recycling
    the oldest; death is `lifetime = 0`, never a shape change
  * randomness is a carried jax.random key in the state pytree, so a
    trajectory is bit-reproducible from its seed (checkpoint/replay safe)
  * rendering reuses the ordinary raster path: the packed scene reserves
    4·N degenerate vertices (models.scene.MeshInstance(particles=N));
    each frame the engine hook `apply_billboards` writes world-space
    camera-facing quad corners for the traced particle uniforms — no
    re-upload, no recompile, dead particles collapse to zero-area quads
    with alpha 0 (discarded exactly like the reference's null fragments,
    Rasterizer.cs:509-523)

Typical wiring (see examples/particle_fountain.py):

    state = initial_particle_state(512, seed=0)
    em = default_emitter_params()
    insts = [..., MeshInstance(particles_mesh(512), particles=512,
                               texture=soft_disc_texture())]
    scene = build_scene_buffers(insts)
    # inside jit:  state = particle_step(state, em, dt)
    #              uniforms.update(particle_uniforms(state, em))
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# Quad corner offsets, in (right, up) units of one particle size; order
# matches particles_mesh's uv/index layout.
_CORNERS = np.asarray([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]],
                      np.float32)


def default_emitter_params() -> Dict:
    """Fountain-ish defaults; every value is traced (live-tunable without
    recompiles, like the character tunables)."""
    return {
        "origin": np.zeros(3, np.float32),
        "base_velocity": np.asarray([0.0, 5.0, 0.0], np.float32),
        "spread": np.float32(1.2),          # isotropic velocity jitter (m/s)
        "rate": np.float32(120.0),          # particles / second
        "gravity": np.asarray([0.0, -9.8, 0.0], np.float32),
        "drag": np.float32(0.1),            # 1/s velocity damping
        "lifetime": np.asarray([1.2, 2.0], np.float32),   # [min, max] s
        "size": np.asarray([0.12, 0.02], np.float32),     # start → end (m)
        "color0": np.asarray([1.0, 0.9, 0.5, 1.0], np.float32),
        "color1": np.asarray([1.0, 0.25, 0.05, 0.0], np.float32),
        "floor_y": np.float32(-1e9),        # bounce plane (-1e9 = off)
        "restitution": np.float32(0.4),
    }


def initial_particle_state(capacity: int, seed: int = 0) -> Dict:
    """All slots dead; `key` makes the trajectory deterministic."""
    return {
        "position": jnp.zeros((capacity, 3), F32),
        "velocity": jnp.zeros((capacity, 3), F32),
        "age": jnp.zeros((capacity,), F32),
        "lifetime": jnp.zeros((capacity,), F32),   # 0 = dead slot
        "cursor": jnp.asarray(0, jnp.int32),
        "accum": jnp.asarray(0.0, F32),            # fractional emissions
        "key": jax.random.PRNGKey(seed),
    }


def particle_step(state: Dict, emitter: Dict, dt,
                  max_emit: Optional[int] = None) -> Dict:
    """One pure step: age/kill → integrate → emit.  Jit-friendly (static
    shapes; `max_emit` is the static per-step emission bound, default
    capacity)."""
    n = state["position"].shape[0]
    m = n if max_emit is None else min(int(max_emit), n)
    dt = jnp.asarray(dt, F32)

    age = state["age"] + dt
    lifetime = jnp.where(age >= state["lifetime"], F32(0.0),
                         state["lifetime"])          # death = lifetime 0

    vel = state["velocity"]
    vel = vel + emitter["gravity"] * dt
    vel = vel * jnp.maximum(F32(0.0), F32(1.0) - emitter["drag"] * dt)
    pos = state["position"] + vel * dt

    # Optional floor bounce (masked arithmetic, like the character step).
    floor = emitter["floor_y"]
    hit = (pos[:, 1] < floor) & (vel[:, 1] < 0)
    vel = vel.at[:, 1].set(jnp.where(
        hit, -emitter["restitution"] * vel[:, 1], vel[:, 1]))
    pos = pos.at[:, 1].set(jnp.where(hit, floor, pos[:, 1]))

    # Ring-buffer emission: k new particles into slots cursor..cursor+k.
    budget = state["accum"] + emitter["rate"] * dt
    k = jnp.minimum(jnp.floor(budget), F32(m)).astype(jnp.int32)
    accum = budget - k.astype(F32)
    key, k1, k2, k3 = jax.random.split(state["key"], 4)
    slots = (state["cursor"] + jnp.arange(m, dtype=jnp.int32)) % n
    live = jnp.arange(m) < k
    new_vel = emitter["base_velocity"] \
        + emitter["spread"] * jax.random.normal(k1, (m, 3), F32)
    lt = emitter["lifetime"]
    new_lt = lt[0] + (lt[1] - lt[0]) * jax.random.uniform(k2, (m,), F32)
    # Sub-step scatter so a burst doesn't stack at one point: each new
    # particle advances a random fraction of dt along its own velocity.
    frac = jax.random.uniform(k3, (m, 1), F32) * dt
    new_pos = emitter["origin"] + new_vel * frac

    def put(arr, new, mask):
        cur = arr[slots]
        return arr.at[slots].set(jnp.where(mask, new, cur))

    lm = live[:, None]
    return {
        "position": put(pos, new_pos, lm),
        "velocity": put(vel, new_vel, lm),
        "age": put(age, jnp.zeros((m,), F32), live),
        "lifetime": put(lifetime, new_lt, live),
        "cursor": (state["cursor"] + k) % n,
        "accum": accum,
        "key": key,
    }


def particle_uniforms(state: Dict, emitter: Dict,
                      prefix: str = "particle_") -> Dict:
    """Traced per-particle render channels: centers + age-faded size and
    color.  Dead slots get size 0 AND alpha 0 (degenerate + discarded)."""
    alive = state["lifetime"] > 0
    t = jnp.clip(state["age"] / jnp.maximum(state["lifetime"], F32(1e-6)),
                 0.0, 1.0)
    sz = emitter["size"]
    size = jnp.where(alive, sz[0] + (sz[1] - sz[0]) * t, F32(0.0))
    color = emitter["color0"] + (emitter["color1"]
                                 - emitter["color0"]) * t[:, None]
    color = color * jnp.where(alive, F32(1.0), F32(0.0))[:, None]
    return {prefix + "centers": state["position"],
            prefix + "size": size,
            prefix + "color": color}


def particles_mesh(capacity: int, extent: float = 50.0) -> Dict:
    """Placeholder billboard mesh: 4·N vertices / 2·N triangles, all at
    the origin until apply_billboards writes the frame's corners.  The
    instance's model matrix must stay identity (corners are computed in
    world space).  `extent` is the conservative culling radius — the
    emitter must stay inside it (frustum culling is per-MESH;
    FrustumCuller.cs:201)."""
    n = int(capacity)
    quad_uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    # Winding chosen so a camera-facing quad is FRONT (area < 0 after the
    # viewport Y-flip) under the default BACK culling — verified by
    # tests/test_particles.py rendering through the full pipeline.
    tri = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    base = 4 * np.arange(n, dtype=np.int32)[:, None, None]
    mesh = {
        "name": f"particles[{n}]",
        "position": np.zeros((4 * n, 3), np.float32),
        "uv": np.tile(quad_uv, (n, 1)),
        "normal": np.tile(np.asarray([[0, 0, 1]], np.float32), (4 * n, 1)),
        "color": np.ones((4 * n, 4), np.float32),
        "indices": (base + tri[None]).reshape(-1, 3),
        "bounds_center": np.zeros(3, np.float32),
        "bounds_radius": float(extent),
    }
    return mesh


def soft_disc_texture(res: int = 32, hardness: float = 2.0) -> np.ndarray:
    """Radial-falloff sprite: white with alpha (1 - r²)^hardness."""
    y, x = np.mgrid[0:res, 0:res]
    r2 = (((x + 0.5) / res - 0.5) ** 2
          + ((y + 0.5) / res - 0.5) ** 2) * 4.0
    a = np.clip(1.0 - r2, 0.0, 1.0) ** hardness
    tex = np.ones((res, res, 4), np.float32)
    tex[..., 3] = a
    return tex


def apply_billboards(vin: Dict, scene: Dict, uniforms: Dict, view,
                     xp=jnp) -> Dict:
    """Engine hook: write camera-facing quad corners into the reserved
    vertex slots.  With the row-vector view matrix V (p_view = p·V), the
    world-space camera basis is V's columns: right = V[:3,0],
    up = V[:3,1], and V[:3,2] = -front, i.e. the direction from the
    scene toward the camera — exactly the billboard normal (validated
    against Camera.right/up/front in tests)."""
    idx = scene["particle_vert_index"]
    pidx = scene["particle_vert_pidx"]
    corner = xp.asarray(scene["particle_corner"], F32)
    centers = xp.asarray(uniforms["particle_centers"], F32)
    size = xp.asarray(uniforms["particle_size"], F32)
    color = xp.asarray(uniforms["particle_color"], F32)

    right = view[:3, 0]
    up = view[:3, 1]
    s = size[pidx][:, None]
    pos = centers[pidx] \
        + (corner[:, 0:1] * s) * right + (corner[:, 1:2] * s) * up
    nrm = xp.broadcast_to(view[:3, 2], pos.shape)
    out = dict(vin)
    out["position"] = vin["position"].at[idx].set(pos)
    out["normal"] = vin["normal"].at[idx].set(nrm)
    out["color"] = vin["color"].at[idx].set(color[pidx])
    return out
