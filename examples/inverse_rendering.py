"""Inverse rendering: recover scene parameters from a target image.

The capability the reference can never have (forward-only C++): render a
target with known scene parameters, perturb them, and recover the
originals by gradient descent through the renderer — every step is one
jit-compiled forward render + backward pass + adam update, optionally
sharded over all visible devices with a single psum for the gradients.

Run:
    python examples/inverse_rendering.py [--steps 200] [--out /tmp/inv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from skele_raytracer_tpu.config import RenderConfig
from skele_raytracer_tpu.models import train
from skele_raytracer_tpu.models.renderer import render_radiance
from skele_raytracer_tpu.scene.parser import parse_scene
from skele_raytracer_tpu.utils.image import quantize, write_ppm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/spheres1.scn")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--out", default="/tmp/inverse_rendering")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = RenderConfig(
        width=args.width, height=args.height, use_shadows=True,
        rays_per_chunk=1 << 14,
    )
    truth = parse_scene(args.scene).to_scene()
    target = render_radiance(truth, cfg, jnp.uint32(0))
    write_ppm(os.path.join(args.out, "target.ppm"), np.asarray(target))

    # Perturb what we'll recover: wash out every sphere's diffuse colour
    # and dim the lights.
    start = truth.replace(
        spheres=truth.spheres.replace(
            diffuse=jnp.full_like(truth.spheres.diffuse, 0.5)
        ),
        point_lights=truth.point_lights.replace(
            colour=truth.point_lights.colour * 0.3
        ),
    )
    write_ppm(
        os.path.join(args.out, "initial.ppm"),
        np.asarray(render_radiance(start, cfg, jnp.uint32(0))),
    )

    fitted, losses = train.fit(
        start, cfg, target, steps=args.steps, learning_rate=args.lr,
        # Optimize only what we perturbed — geometry/camera stay fixed
        # (silhouette gradients are biased; see train.make_trainable_mask).
        trainable_paths=["spheres.diffuse", "point_lights.colour"],
        checkpoint_dir=os.path.join(args.out, "ckpt"), checkpoint_every=50,
        log_every=20,
    )
    final = render_radiance(fitted, cfg, jnp.uint32(0))
    write_ppm(os.path.join(args.out, "fitted.ppm"), np.asarray(final))

    mae = float(jnp.abs(final - target).mean())
    print(
        f"loss {losses[0]:.5f} -> {losses[-1]:.6f}; "
        f"final image MAE {mae:.5f}; images in {args.out}/"
        "\n(recovered light x albedo products match the target; the"
        " individual factors are identifiable only up to that product)"
    )


if __name__ == "__main__":
    main()
