#!/usr/bin/env python
"""Generate the checked-in DAE/FBX import fixtures (tests/fixtures/).

Both files carry the SAME cube geometry and node transform as the glTF
twin tests/test_import_formats.py builds in-code, so the three importers
can be cross-checked for identical baking.  Deterministic output — rerun
only when the fixture contract changes.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXDIR = os.path.join(REPO, "tests", "fixtures")

# The shared fixture transform (see tests/test_import_formats.py).
TRANSLATION = (0.5, -0.25, -3.0)
ROT_Z_DEG = 30.0
SCALE = (1.0, 2.0, 1.5)


def cube():
    from softwarerenderer_tpu.models import primitives
    return primitives.cube(1.0)


def write_dae(path):
    m = cube()
    pos = np.asarray(m["position"], np.float64)
    nrm = np.asarray(m["normal"], np.float64)
    uv = np.asarray(m["uv"], np.float64).copy()
    uv[:, 1] = 1.0 - uv[:, 1]   # author V upward; importers flip back
    idx = np.asarray(m["indices"], np.int64)

    def fmt(a):
        return " ".join(repr(float(x)) for x in np.asarray(a).reshape(-1))

    # interleaved <p>: POSITION/NORMAL share offset 0, TEXCOORD offset 1
    # (same index stream — the cube's vertices are corner-unique per
    # attribute set already)
    p = " ".join(f"{int(i)} {int(i)}" for i in idx.reshape(-1))
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <asset>
  <unit name="meter" meter="1"/>
  <up_axis>Y_UP</up_axis>
 </asset>
 <library_effects>
  <effect id="mat-effect">
   <profile_COMMON>
    <technique sid="common">
     <lambert>
      <diffuse><color sid="diffuse">0.8 0.6 0.4 1</color></diffuse>
     </lambert>
    </technique>
   </profile_COMMON>
  </effect>
 </library_effects>
 <library_materials>
  <material id="mat" name="mat"><instance_effect url="#mat-effect"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="cube-geo" name="cube">
   <mesh>
    <source id="cube-pos">
     <float_array id="cube-pos-array" count="{pos.size}">{fmt(pos)}</float_array>
     <technique_common>
      <accessor source="#cube-pos-array" count="{pos.shape[0]}" stride="3">
       <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
      </accessor>
     </technique_common>
    </source>
    <source id="cube-nrm">
     <float_array id="cube-nrm-array" count="{nrm.size}">{fmt(nrm)}</float_array>
     <technique_common>
      <accessor source="#cube-nrm-array" count="{nrm.shape[0]}" stride="3">
       <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
      </accessor>
     </technique_common>
    </source>
    <source id="cube-uv">
     <float_array id="cube-uv-array" count="{uv.size}">{fmt(uv)}</float_array>
     <technique_common>
      <accessor source="#cube-uv-array" count="{uv.shape[0]}" stride="2">
       <param name="S" type="float"/><param name="T" type="float"/>
      </accessor>
     </technique_common>
    </source>
    <vertices id="cube-verts">
     <input semantic="POSITION" source="#cube-pos"/>
     <input semantic="NORMAL" source="#cube-nrm"/>
    </vertices>
    <triangles material="matsym" count="{idx.shape[0]}">
     <input semantic="VERTEX" source="#cube-verts" offset="0"/>
     <input semantic="TEXCOORD" source="#cube-uv" offset="1" set="0"/>
     <p>{p}</p>
    </triangles>
   </mesh>
  </geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene" name="scene">
   <node id="cube-node" name="cube">
    <translate>{TRANSLATION[0]} {TRANSLATION[1]} {TRANSLATION[2]}</translate>
    <rotate>0 0 1 {ROT_Z_DEG}</rotate>
    <scale>{SCALE[0]} {SCALE[1]} {SCALE[2]}</scale>
    <instance_geometry url="#cube-geo">
     <bind_material>
      <technique_common>
       <instance_material symbol="matsym" target="#mat"/>
      </technique_common>
     </bind_material>
    </instance_geometry>
   </node>
  </visual_scene>
 </library_visual_scenes>
 <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""
    with open(path, "w") as f:
        f.write(xml)


def write_fbx_fixture(path):
    from softwarerenderer_tpu.io_host.fbx import write_fbx
    m = cube()
    uv = np.asarray(m["uv"], np.float64).copy()
    uv[:, 1] = 1.0 - uv[:, 1]   # author V upward; importer flips back
    write_fbx(path, m["position"], m["indices"], normals=m["normal"],
              uvs=uv, translation=TRANSLATION,
              rotation_deg=(0.0, 0.0, ROT_Z_DEG), scaling=SCALE,
              diffuse_color=(0.8, 0.6, 0.4))


def write_3ds_fixture(path):
    """3DS stores vertices already placed in world space (no node
    transforms in the static subset) — bake the shared fixture TRS into
    the positions, exactly what an exporter would do."""
    from softwarerenderer_tpu.io_host.tds import write_3ds
    m = cube()
    pos = np.asarray(m["position"], np.float64) * np.asarray(SCALE)
    a = np.deg2rad(ROT_Z_DEG)
    c, s = np.cos(a), np.sin(a)
    rz = np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    pos = pos @ rz.T + np.asarray(TRANSLATION)
    uv = np.asarray(m["uv"], np.float64).copy()
    uv[:, 1] = 1.0 - uv[:, 1]   # author V upward; importer flips back
    write_3ds(path, pos, m["indices"], uvs=uv,
              diffuse_color=(0.8, 0.6, 0.4))


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    write_dae(os.path.join(FIXDIR, "cube.dae"))
    write_fbx_fixture(os.path.join(FIXDIR, "cube.fbx"))
    write_3ds_fixture(os.path.join(FIXDIR, "cube.3ds"))
    print("wrote", os.listdir(FIXDIR))
