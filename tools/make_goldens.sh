#!/usr/bin/env bash
# Regenerate tests/goldens/*.ppm.gz by BUILDING AND RUNNING the reference
# binary (/root/reference, lilinitsy/skele-raytracer) and rendering the
# repo's scene files. Differential-testing harness only — nothing built
# here ships in the framework.
#
# Two obstacles and their documented resolutions:
#
# 1. SDL2 is not installed. Only the visual path (src/main.cpp:108-227)
#    calls SDL at runtime; a ~20-line no-op stub header satisfies the
#    includes so both render paths build. The batch path (--parallel true)
#    never executes a stub function.
#
# 2. Two pieces of undefined behavior in the reference would otherwise
#    make goldens unreproducible, so they are PINNED to the code's evident
#    intent with one-line initializations (verified: outputs for all
#    defined-behavior configs are byte-identical with and without the
#    pins):
#      a. `bool use_shadows;` (src/main.cpp:244) is never initialized and
#         only ever set to true (src/main.cpp:375-378). On this
#         gcc/-O2 build the garbage is truthy, so "--shadow" was a no-op
#         and EVERY render had shadows — contradicting the reference's
#         own published no_shadow renders (README.md:36-44). Pinned:
#         `= false`.
#      b. The `spherical_fog` sscanf format string starts with "fog"
#         (src/scene.cpp:210) so 0 fields convert and the fog is built
#         from uninitialized stack floats (SURVEY §2.9.6). Pinned: all
#         nine floats `= 0`, which matches the framework's documented
#         parity stand-in (config.Quirks.fog_sscanf_mismatch).
set -euo pipefail
S=/root/repo/scenes
OUT=/root/repo/tests/goldens
BUILD=$(mktemp -d /tmp/skele_ref_goldens.XXXX)

mkdir -p "$BUILD/stub"
cat > "$BUILD/stub/SDL.h" <<'EOF'
// Minimal SDL2 stub: only what src/main.cpp's visual path references.
// The batch path (--parallel true) never calls these at runtime.
#pragma once
typedef struct SDL_Window SDL_Window;
typedef struct SDL_Renderer SDL_Renderer;
typedef union SDL_Event { int type; } SDL_Event;
enum { SDL_INIT_VIDEO = 1, SDL_WINDOW_SHOWN = 4, SDL_QUIT = 0x100,
       SDL_RENDERER_ACCELERATED = 2, SDL_WINDOWPOS_UNDEFINED = 0x1FFF0000 };
static inline int SDL_Init(unsigned) { return 0; }
static inline SDL_Window *SDL_CreateWindow(const char*, int, int, int, int, unsigned) { return (SDL_Window*)1; }
static inline SDL_Renderer *SDL_CreateRenderer(SDL_Window*, int, unsigned) { return (SDL_Renderer*)1; }
static inline int SDL_SetRenderDrawColor(SDL_Renderer*, unsigned char, unsigned char, unsigned char, unsigned char) { return 0; }
static inline int SDL_RenderDrawPoint(SDL_Renderer*, int, int) { return 0; }
static inline int SDL_RenderClear(SDL_Renderer*) { return 0; }
static inline void SDL_RenderPresent(SDL_Renderer*) {}
static inline int SDL_PollEvent(SDL_Event*) { return 0; }
static inline void SDL_DestroyRenderer(SDL_Renderer*) {}
static inline void SDL_DestroyWindow(SDL_Window*) {}
static inline void SDL_Quit() {}
static inline const char *SDL_GetError() { return ""; }
EOF
printf '#pragma once\n' > "$BUILD/stub/SDL_opengl.h"

cp -r /root/reference/src "$BUILD/src"
cd "$BUILD/src"
rm -f ./*.o ./*.gch raytracer  # the repo ships stale dev-machine objects
# UB pin (a): uninitialized use_shadows -> the evident intent
sed -i 's/\tbool use_shadows;/\tbool use_shadows = false;/' main.cpp
# UB pin (b): fog sscanf mismatch leaves its floats uninitialized -> zeros
sed -i 's/\t\t\tfloat x, y, z, rad, r, g, b, s, abso;/\t\t\tfloat x = 0, y = 0, z = 0, rad = 0, r = 0, g = 0, b = 0, s = 0, abso = 0;/' scene.cpp
grep -q 'use_shadows = false' main.cpp
grep -q 'float x = 0' scene.cpp

g++ -O2 -std=c++11 -fopenmp -w -I"$BUILD/stub" -c -o main.o main.cpp
g++ -O2 -std=c++11 -fopenmp -w -c -o scene.o scene.cpp
g++ -fopenmp -o raytracer main.o scene.o

R="$BUILD/src/raytracer"
# --parallel true hardcodes 640x480, depth=1, no supersampling
# (src/main.cpp:21-24); these are the deterministic (rand()-free) configs.
"$R" --path "$S/spheres1.scn" --output "$BUILD/spheres1_bp.ppm" --parallel true
"$R" --path "$S/spheres1.scn" --output "$BUILD/spheres1_bp_shadows.ppm" --parallel true --shadow
"$R" --path "$S/spheres2.scn" --output "$BUILD/spheres2_bp.ppm" --parallel true
"$R" --path "$S/spheres2.scn" --output "$BUILD/spheres2_bp_shadows.ppm" --parallel true --shadow
"$R" --path "$S/test.scn" --output "$BUILD/test_bp_shadows.ppm" --parallel true --shadow
"$R" --path "$S/dragon.scn" --output "$BUILD/dragon_bp_shadows.ppm" --parallel true --shadow
# The serial path honors width/height/depth (no hardcodes) but loops
# forever on a quit-poll after writing the PPM (src/main.cpp:215-223).
timeout 120 "$R" --path "$S/spheres1.scn" --output "$BUILD/spheres1_serial_160.ppm" \
  --width 160 --height 120 --depth 3 --shadow --parallel false || true
[ -s "$BUILD/spheres1_serial_160.ppm" ]

mkdir -p "$OUT"
for f in spheres1_bp spheres1_bp_shadows spheres2_bp spheres2_bp_shadows \
         test_bp_shadows dragon_bp_shadows spheres1_serial_160; do
  gzip -9 -c "$BUILD/$f.ppm" > "$OUT/$f.ppm.gz"
done
echo "goldens written to $OUT"
