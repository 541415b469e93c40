"""Model loading facade: caching, flip-book animation, OBJ, instances.

Mirrors the reference's Model.LoadModel behavior (ModelLoader.cs:69-135):
a path can be a single model file OR a directory whose model files (sorted
by name) become flip-book animation frames advanced at a fixed FPS
(ModelLoader.cs:331-348).  Models and decoded textures are cached by
normalized path (ModelLoader.cs:62-63, Renderer.cs:15).

Formats: glTF/GLB via the first-party importer (io_host.gltf) and a small
OBJ parser (the reference reaches OBJ through Assimp; BASELINE config 2
uses one).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from softwarerenderer_tpu.io_host import gltf as gltf_mod
from softwarerenderer_tpu.models.scene import (
    Light,
    Material,
    MeshInstance,
    bounding_sphere,
)

F32 = np.float32

_MODEL_CACHE: Dict[str, "Model"] = {}
_TEXTURE_CACHE: Dict[str, Optional[np.ndarray]] = {}

SUPPORTED_EXTENSIONS = {".gltf", ".glb", ".obj"}


@dataclasses.dataclass
class Model:
    """Loaded model: world-baked meshes + lights + animation frames."""

    meshes: List[Dict] = dataclasses.field(default_factory=list)
    lights: List[Light] = dataclasses.field(default_factory=list)
    animation_frames: List["Model"] = dataclasses.field(default_factory=list)
    _frame_index: int = 0
    _time_accumulator: float = 0.0

    def play_animation(self, on_frame: Callable[["Model"], None],
                       delta_time: float, fps: int = 30) -> None:
        """Flip-book stepping exactly as ModelLoader.PlayAnimation
        (ModelLoader.cs:331-348)."""
        if not self.animation_frames:
            return
        frame_duration = 1.0 / fps
        self._time_accumulator += delta_time
        while self._time_accumulator >= frame_duration:
            self._time_accumulator -= frame_duration
            self._frame_index = (self._frame_index + 1) \
                % len(self.animation_frames)
        on_frame(self.animation_frames[self._frame_index])

    def advance_animation(self, delta_time: float, fps: int = 30) -> int:
        """PlayAnimation's fixed-FPS timing, returning the current frame
        index — feed it to the device as uniforms["anim_frame"] (the
        TPU-native path: frame stacks live on device, the index is a
        traced scalar, so stepping never re-uploads or recompiles)."""
        self.play_animation(lambda _m: None, delta_time, fps)
        return self._frame_index


def clear_caches() -> None:
    _MODEL_CACHE.clear()
    _TEXTURE_CACHE.clear()


def load_texture(path: str) -> Optional[np.ndarray]:
    """Cached image decode (Texture.LoadTexture + Renderer's
    ConcurrentDictionary cache, Texture.cs:70-94, Renderer.cs:821-828)."""
    key = os.path.abspath(path)
    if key not in _TEXTURE_CACHE:
        _TEXTURE_CACHE[key] = gltf_mod.load_image(key)
    return _TEXTURE_CACHE[key]


def load_obj(path: str) -> Dict:
    """Minimal OBJ: v/vt/vn + triangulated f (fan for polygons)."""
    positions, uvs, normals = [], [], []
    out_pos, out_uv, out_n = [], [], []
    indices = []
    vert_cache: Dict[str, int] = {}

    def corner(spec: str) -> int:
        if spec in vert_cache:
            return vert_cache[spec]
        parts = (spec.split("/") + ["", ""])[:3]
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(positions) + vi
        ti = int(parts[1]) - 1 if parts[1] else None
        ni = int(parts[2]) - 1 if parts[2] else None
        out_pos.append(positions[vi])
        out_uv.append(uvs[ti] if ti is not None else (0.0, 0.0))
        out_n.append(normals[ni] if ni is not None else (0.0, 0.0, 0.0))
        idx = len(out_pos) - 1
        vert_cache[spec] = idx
        return idx

    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                positions.append(tuple(float(x) for x in t[1:4]))
            elif t[0] == "vt":
                uvs.append((float(t[1]), 1.0 - float(t[2])))  # FlipUVs
            elif t[0] == "vn":
                normals.append(tuple(float(x) for x in t[1:4]))
            elif t[0] == "f":
                corners = [corner(s) for s in t[1:]]
                for i in range(1, len(corners) - 1):
                    indices.append((corners[0], corners[i], corners[i + 1]))

    pos = np.asarray(out_pos, dtype=F32).reshape(-1, 3)
    center, radius = bounding_sphere(pos)
    mesh = {
        "position": pos,
        "uv": np.asarray(out_uv, dtype=F32).reshape(-1, 2),
        "normal": np.asarray(out_n, dtype=F32).reshape(-1, 3),
        "color": np.ones((pos.shape[0], 4), dtype=F32),
        "indices": np.asarray(indices, dtype=np.int32).reshape(-1, 3),
        "material": Material(),
        "bounds_center": center,
        "bounds_radius": radius,
    }
    return {"meshes": [mesh], "lights": []}


def _load_single(path: str) -> Model:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".gltf", ".glb"):
        doc = gltf_mod.load_gltf(path)
    elif ext == ".obj":
        doc = load_obj(path)
    else:
        raise ValueError(f"unsupported model format: {ext}")
    return Model(meshes=doc["meshes"], lights=doc["lights"])


def load_model(path: str) -> Model:
    """Cached load; a directory = flip-book animation (ModelLoader.cs:79-115)."""
    norm = os.path.abspath(path)
    if norm in _MODEL_CACHE:
        return _MODEL_CACHE[norm]
    if os.path.isdir(norm):
        files = sorted(
            f for f in os.listdir(norm)
            if os.path.splitext(f)[1].lower() in SUPPORTED_EXTENSIONS)
        frames = [_load_single(os.path.join(norm, f)) for f in files]
        model = Model(animation_frames=frames)
        if frames:
            model.meshes = frames[0].meshes
            model.lights = frames[0].lights
    elif os.path.isfile(norm):
        model = _load_single(norm)
    else:
        raise FileNotFoundError(f"Model path not found: {norm}")
    _MODEL_CACHE[norm] = model
    return model


def model_instances(model: Model, model_matrix: Optional[np.ndarray] = None,
                    texture_override: Optional[np.ndarray] = None,
                    fallback_texture: Optional[np.ndarray] = None
                    ) -> List[MeshInstance]:
    """Turn a loaded model into packed-scene MeshInstances, resolving each
    mesh's diffuse texture through the cache (missing files → fallback)."""
    mm = (np.eye(4, dtype=F32) if model_matrix is None
          else np.asarray(model_matrix, dtype=F32))
    out = []
    for i, mesh in enumerate(model.meshes):
        material: Material = mesh.get("material", Material())
        tex = texture_override
        if tex is None:
            tex_path = material.texture_path("diffuse")
            if tex_path is not None:
                tex = load_texture(tex_path)
            if tex is None:
                tex = fallback_texture
        anim_pos = anim_nrm = None
        frames = model.animation_frames
        if len(frames) > 1 and all(
                i < len(f.meshes)
                and f.meshes[i]["position"].shape
                == mesh["position"].shape for f in frames):
            # Flip-book stacks (same topology per frame,
            # ModelLoader.cs:345-347) → device-side animation buffers.
            anim_pos = np.stack([np.asarray(f.meshes[i]["position"], F32)
                                 for f in frames])
            anim_nrm = np.stack([np.asarray(f.meshes[i]["normal"], F32)
                                 for f in frames])
        out.append(MeshInstance(mesh=mesh, model_matrix=mm, texture=tex,
                                material=material,
                                animation_positions=anim_pos,
                                animation_normals=anim_nrm))
    return out
