"""ctypes bindings to the native C++ scene parser (native/parser.cpp).

The reference's parser is host-side C++ (src/scene.cpp); its TPU-native
equivalent keeps a native fast path for large scene files (dragon.scn is
~15k lines / 10k triangles) while the Python parser remains the portable
fallback and the semantic source of truth (both implement the grammar in
scene/parser.py's docstring and are cross-checked by tests).
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libskeletrace.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # Try to build it on the fly (cheap; only needs g++).
        makefile_dir = os.path.dirname(path)
        if os.path.exists(os.path.join(makefile_dir, "Makefile")):
            code = os.system(f"make -C {makefile_dir} -s > /dev/null 2>&1")
            if code != 0 or not os.path.exists(path):
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.skt_parse_scene_json.restype = ctypes.c_void_p
        lib.skt_parse_scene_json.argtypes = [ctypes.c_char_p]
        lib.skt_free.restype = None
        lib.skt_free.argtypes = [ctypes.c_void_p]
        lib.skt_write_ppm.restype = ctypes.c_int
        lib.skt_write_ppm.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except OSError as e:  # pragma: no cover
        log.debug("could not load native parser: %s", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_scene_native(path: str) -> Optional["ParsedScene"]:
    """Parse via the C++ library; returns None if the library is missing.

    The C++ side serializes the parse to JSON (parse speed dominates; the
    JSON hop costs microseconds at these scene sizes and keeps the ABI to
    two functions).
    """
    from skele_raytracer_tpu.scene.parser import ParsedScene

    lib = _load()
    if lib is None:
        return None
    ptr = lib.skt_parse_scene_json(path.encode())
    if not ptr:
        raise FileNotFoundError(f"native parser could not open {path}")
    try:
        data = json.loads(ctypes.string_at(ptr).decode())
    finally:
        lib.skt_free(ptr)

    scene = ParsedScene(
        width=data["width"],
        height=data["height"],
        max_depth=data["max_depth"],
        output_image=data.get("output_image") or None,
        ambient=tuple(data["ambient"]),
        background=tuple(data["background"]),
        camera_position=tuple(data["camera"]["position"]),
        camera_direction=tuple(data["camera"]["direction"]),
        camera_up=tuple(data["camera"]["up"]),
        half_height_angle=data["camera"]["half_height_angle"],
    )
    scene.vertices = [tuple(v) for v in data["vertices"]]
    for s in data["spheres"]:
        scene.spheres.append(
            dict(center=tuple(s["center"]), radius=s["radius"],
                 ambient=tuple(s["ambient"]), diffuse=tuple(s["diffuse"]),
                 specular=tuple(s["specular"]), transmissive=tuple(s["transmissive"]),
                 power=s["power"], ior=s["ior"])
        )
    for t in data["triangles"]:
        scene.triangles.append(
            dict(v0=tuple(t["v0"]), v1=tuple(t["v1"]), v2=tuple(t["v2"]),
                 ambient=tuple(t["ambient"]), diffuse=tuple(t["diffuse"]),
                 specular=tuple(t["specular"]), transmissive=tuple(t["transmissive"]),
                 power=t["power"], ior=t["ior"])
        )
    for l in data["point_lights"]:
        scene.point_lights.append(dict(position=tuple(l["position"]), colour=tuple(l["colour"])))
    for l in data["directional_lights"]:
        scene.directional_lights.append(dict(direction=tuple(l["direction"]), colour=tuple(l["colour"])))
    for f in data["fog"]:
        scene.fog.append(
            dict(center=tuple(f["center"]), radius=f["radius"], albedo=tuple(f["albedo"]),
                 scattering=f["scattering"], absorption=f["absorption"])
        )
    return scene


def write_ppm_native(path: str, img) -> bool:
    """Write float [H, W, 3] radiance as binary P6 via the C++ writer
    (reference quantization: min(1, v) * 255). Returns False if the
    native library is unavailable (caller falls back to Python)."""
    import numpy as np

    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(np.asarray(img, dtype=np.float32))
    h, w, _ = a.shape
    code = lib.skt_write_ppm(
        path.encode(), w, h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if code != 0:
        raise OSError(f"native PPM write failed with code {code}: {path}")
    return True
