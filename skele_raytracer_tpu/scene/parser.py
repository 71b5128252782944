"""`.scn` scene-description parser.

Re-implements the reference's line-oriented sscanf dispatch parser
(`parseScene`, reference src/scene.cpp:12-227; duplicated in
cudasrc/scene.h:182-398) as a single shared Python parser producing a
`ParsedScene`, which materializes into a padded `Scene` pytree per semantic
mode. A native C++ parser with identical semantics is available via
`skele_raytracer_tpu.scene.native` for large scenes (dragon.scn: ~15k lines).

Grammar (one command per line, first token dispatches):
  sphere x y z r                              (src/scene.cpp:46-57)
  vertex x y z                                (src/scene.cpp:59-64)
  triangle i0 i1 i2      — indices parsed as floats, truncated
                                              (src/scene.cpp:67-82)
  camera px py pz dx dy dz ux uy uz half_height_angle
                                              (src/scene.cpp:84-103)
  film_resolution w h                         (src/scene.cpp:105-109)
  background r g b                            (src/scene.cpp:111-117)
  material ar ag ab dr dg db sr sg sb power tr tg tb ior
         — a state machine: applies to all shapes that follow
                                              (src/scene.cpp:119-137)
  directional_light r g b x y z — channels clamped to <=1; the reference
         never push_backs the light (src/scene.cpp:139-163), replicated by
         Quirks.drop_directional_lights at build time
  point_light r g b x y z                     (src/scene.cpp:165-179)
  ambient_light r g b    — accumulates (+=) across lines
                                              (src/scene.cpp:181-189)
  max_depth n            — parsed into the scene but ignored by the
         reference integrator (src/scene.cpp:192-198, SURVEY.md §2.9.12)
  output_image path      — parsed and ignored (src/scene.cpp:200-205)
  spherical_fog x y z rad r g b scattering absorption — the reference's
         sscanf format string says "fog ..." so zero fields convert and the
         fog gets uninitialized values (src/scene.cpp:207-212); parity mode
         stands in all-zero parameters, clean mode parses the real values.
  # comment lines and blank lines are skipped (src/scene.cpp:31-44)
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from skele_raytracer_tpu.config import PARITY, Quirks
from skele_raytracer_tpu.scene.types import Scene, make_scene

log = logging.getLogger(__name__)


@dataclass
class _Material:
    """Parser material state (reference src/material.h:9-26 defaults)."""

    ambient: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    diffuse: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    specular: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    transmissive: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    power: float = 1.0
    ior: float = 1.0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class ParsedScene:
    """Raw parse result, before padding/mode selection.

    Mirrors the reference `Scene` struct defaults (src/scene.h:15-27):
    width 1920, height 1080, maxDepth 1, use_shadows False.
    """

    width: int = 1920
    height: int = 1080
    max_depth: int = 1
    output_image: Optional[str] = None
    spheres: List[dict] = field(default_factory=list)
    vertices: List[Tuple[float, float, float]] = field(default_factory=list)
    triangles: List[dict] = field(default_factory=list)
    point_lights: List[dict] = field(default_factory=list)
    directional_lights: List[dict] = field(default_factory=list)
    ambient: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    fog: List[dict] = field(default_factory=list)
    camera_position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    camera_direction: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    camera_up: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    half_height_angle: float = 0.0
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def to_scene(self, quirks: Quirks = PARITY, pad_multiple: int = 8) -> Scene:
        """Materialize the padded, device-ready Scene pytree for a mode."""
        directional = [] if quirks.drop_directional_lights else self.directional_lights
        if quirks.fog_sscanf_mismatch:
            # Deterministic stand-in for the reference's uninitialized-float
            # fog (src/scene.cpp:210-211): keep the entry, zero the params.
            fog = [
                dict(center=(0.0, 0.0, 0.0), radius=0.0, albedo=(0.0, 0.0, 0.0),
                     scattering=0.0, absorption=0.0)
                for _ in self.fog
            ]
        else:
            fog = self.fog
        return make_scene(
            spheres=self.spheres,
            triangles=self.triangles,
            point_lights=self.point_lights,
            directional_lights=directional,
            ambient=self.ambient,
            fog=fog,
            fog_zeroed=bool(self.fog) and quirks.fog_sscanf_mismatch,
            camera_position=self.camera_position,
            camera_direction=self.camera_direction,
            camera_up=self.camera_up,
            half_height_angle=self.half_height_angle,
            background=self.background,
            pad_multiple=pad_multiple,
        )


def _floats(tokens: List[str], n: int, command: str) -> List[float]:
    """Read up to n floats like sscanf %f: missing/garbled fields become 0.

    The reference leaves unconverted sscanf outputs uninitialized (UB); a
    deterministic 0.0 stands in, with a warning so malformed scenes surface.
    """
    out = []
    for i in range(n):
        if i < len(tokens):
            try:
                out.append(float(tokens[i]))
                continue
            except ValueError:
                pass
        log.warning("command %r: field %d missing/invalid, using 0.0", command, i)
        out.append(0.0)
    return out


def parse_scene_text(text: str) -> ParsedScene:
    """Parse .scn content from a string (see module docstring for grammar)."""
    scene = ParsedScene()
    mat = _Material()
    ambient = [0.0, 0.0, 0.0]

    for raw in text.splitlines():
        # The reference skips lines whose FIRST character is '#'
        # (src/scene.cpp:31-35) — an indented comment would be an unknown
        # command there; we accept leading whitespace before '#'.
        stripped = raw.lstrip()
        if not stripped or stripped.startswith("#"):
            continue
        tokens = stripped.split()
        command, args = tokens[0], tokens[1:]

        if command == "sphere":
            x, y, z, r = _floats(args, 4, command)
            scene.spheres.append(dict(center=(x, y, z), radius=r, **mat.as_dict()))
        elif command == "vertex":
            scene.vertices.append(tuple(_floats(args, 3, command)))
        elif command == "triangle":
            # Indices are read as floats and truncated on use
            # (src/scene.cpp:69-74: sscanf %f then vector[float]).
            i0, i1, i2 = (int(v) for v in _floats(args, 3, command))
            if not all(0 <= i < len(scene.vertices) for i in (i0, i1, i2)):
                # The reference would read out of bounds (UB); skip + warn.
                log.warning("triangle indices (%d,%d,%d) out of range; skipped", i0, i1, i2)
                continue
            v0, v1, v2 = scene.vertices[i0], scene.vertices[i1], scene.vertices[i2]
            scene.triangles.append(dict(v0=v0, v1=v1, v2=v2, **mat.as_dict()))
        elif command == "camera":
            f = _floats(args, 10, command)
            scene.camera_position = tuple(f[0:3])
            scene.camera_direction = tuple(f[3:6])
            scene.camera_up = tuple(f[6:9])
            scene.half_height_angle = f[9]
            # The reference calls glm::normalize on direction/up and discards
            # the results (src/scene.cpp:92-93) — vectors stay as parsed.
        elif command == "film_resolution":
            w, h = _floats(args, 2, command)
            scene.width, scene.height = int(w), int(h)
        elif command == "background":
            scene.background = tuple(_floats(args, 3, command))
        elif command == "material":
            f = _floats(args, 14, command)
            mat = _Material(
                ambient=tuple(f[0:3]),
                diffuse=tuple(f[3:6]),
                specular=tuple(f[6:9]),
                power=f[9],
                transmissive=tuple(f[10:13]),
                ior=f[13],
            )
        elif command == "directional_light":
            r, g, b, x, y, z = _floats(args, 6, command)
            # Per-channel upper clamp at 1 (src/scene.cpp:143-154).
            r, g, b = min(r, 1.0), min(g, 1.0), min(b, 1.0)
            scene.directional_lights.append(dict(direction=(x, y, z), colour=(r, g, b)))
        elif command == "point_light":
            r, g, b, x, y, z = _floats(args, 6, command)
            scene.point_lights.append(dict(position=(x, y, z), colour=(r, g, b)))
        elif command == "ambient_light":
            r, g, b = _floats(args, 3, command)
            # Accumulates across lines (src/scene.cpp:187-189).
            ambient[0] += r
            ambient[1] += g
            ambient[2] += b
            scene.ambient = tuple(ambient)
        elif command == "max_depth":
            (n,) = _floats(args, 1, command)
            scene.max_depth = int(n)
        elif command == "output_image":
            scene.output_image = args[0] if args else None
        elif command == "spherical_fog":
            x, y, z, rad, r, g, b, s, absorption = _floats(args, 9, command)
            scene.fog.append(
                dict(center=(x, y, z), radius=rad, albedo=(r, g, b),
                     scattering=s, absorption=absorption)
            )
        else:
            # Unknown commands warn and skip (src/scene.cpp:214-217) — e.g.
            # max_vertices/max_normals in dragon.scn, spot_light in test.scn.
            log.warning("unknown command: %s", command)

    return scene


def parse_scene(path: str, prefer_native: bool = True) -> ParsedScene:
    """Parse a .scn file. Uses the native C++ parser when available (and
    `prefer_native`), falling back to the pure-Python implementation."""
    if prefer_native:
        try:
            from skele_raytracer_tpu.scene import native

            parsed = native.parse_scene_native(path)
            if parsed is not None:
                return parsed
        except Exception as e:  # pragma: no cover - fallback path
            log.debug("native parser unavailable (%s); using Python parser", e)
    with open(path, "r") as f:
        return parse_scene_text(f.read())
