#!/usr/bin/env bash
# Regenerate tests/goldens/*.ppm.gz by BUILDING AND RUNNING the reference
# binary (/root/reference, lilinitsy/skele-raytracer) and rendering the
# repo's scene files. Differential-testing harness only — nothing built
# here ships in the framework. Build details + UB pins: see
# tools/build_reference.sh. Stochastic (rand()-driven) configs are
# handled separately by tools/make_stochastic_goldens.sh.
set -euo pipefail
S=/root/repo/scenes
OUT=/root/repo/tests/goldens
BUILD=$(mktemp -d /tmp/skele_ref_goldens.XXXX)
bash "$(dirname "$0")/build_reference.sh" "$BUILD"

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
