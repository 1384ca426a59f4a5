"""Generate the committed golden images for tests/test_golden.py.

Renders the five cornell-box OBJ fixtures (public-domain McGuire archive,
vendored by the reference at ``assets/meshes/cornell-box``) at fixed seed /
resolution / spp on the CPU backend and stores float16 radiance images.

Run from the repo root:  python tools/make_goldens.py
Regenerate ONLY when an intentional change alters converged output; the
test tolerances absorb cross-platform numeric drift but not sampling or
estimator changes.
"""
from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tests.golden_config import FIXTURE_DIR, GOLDEN_DIR, SCENES, render_fixture  # noqa: E402


def render_texbox() -> np.ndarray:
    """The textured-OBJ fixture golden (tests/test_tex_import.py)."""
    from mcrt_tpu import RenderConfig, Renderer
    from mcrt_tpu.config import AccelType, IntegratorConfig
    from mcrt_tpu.scene.builders import scene_from_obj

    scene, camera = scene_from_obj(
        os.path.join(os.path.dirname(GOLDEN_DIR), "assets", "texbox.obj"),
        camera_kw=dict(eye=(0.0, 1.0, 2.5), target=(0.0, 0.8, 0.0),
                       fov_deg=50.0),
    )
    cfg = RenderConfig(
        width=32, height=32, spp=16, samples_per_pass=16,
        accel=AccelType.BRUTE, integrator=IntegratorConfig(max_depth=3),
    )
    return np.asarray(Renderer(scene, camera, cfg).render())


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in SCENES:
        img = render_fixture(name)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, image=img.astype(np.float16))
        print(f"{name}: mean {img.mean():.4f} -> {path}")
    img = render_texbox()
    path = os.path.join(GOLDEN_DIR, "texbox.npz")
    np.savez_compressed(path, image=img.astype(np.float16))
    print(f"texbox: mean {img.mean():.4f} -> {path}")
    # BDPT golden: same cornell fixture through the bidirectional
    # integrator (VERDICT r3 item 3c)
    from mcrt_tpu.config import IntegratorType

    img = render_fixture("CornellBox-Original",
                         integrator=IntegratorType.BDPT, spp=8, depth=3)
    path = os.path.join(GOLDEN_DIR, "CornellBox-Original-bdpt.npz")
    np.savez_compressed(path, image=img.astype(np.float16))
    print(f"CornellBox-Original-bdpt: mean {img.mean():.4f} -> {path}")
    # flagship 128^2 golden (VERDICT r4 item 7)
    img = render_fixture("CornellBox-Original", size=128, spp=16)
    path = os.path.join(GOLDEN_DIR, "CornellBox-Original-128.npz")
    np.savez_compressed(path, image=img.astype(np.float16))
    print(f"CornellBox-Original-128: mean {img.mean():.4f} -> {path}")
    # heavy composite golden (tests/test_heavy_golden.py): rendered with
    # the SAH builder; the SBVH test must match the same image
    import tests.test_heavy_golden as hg
    from mcrt_tpu.config import BuilderType

    if os.path.exists(hg.BUNNY):
        img = hg._render(BuilderType.SAH)
        path = os.path.join(GOLDEN_DIR, "heavy_gallery.npz")
        np.savez_compressed(path, image=img.astype(np.float16))
        print(f"heavy_gallery: mean {img.mean():.4f} -> {path}")


if __name__ == "__main__":
    main()
