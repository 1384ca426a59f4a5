"""Heavy composite golden (VERDICT r3 item 8): ~180k-triangle bunny
gallery with textures, mirror/glass materials, and all four light types,
rendered through the production blocked accel with BOTH native builders
(SAH and SBVH spatial splits).  Catches integration regressions the 5-box
cornell fixtures structurally cannot (conformance-suite spirit,
``radeon_rays_conformance_test_cl.h:181-430``)."""
from __future__ import annotations

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "heavy_gallery.npz")
BUNNY = "/root/reference/assets/meshes/bunny.obj"

needs_bunny = pytest.mark.skipif(not os.path.exists(BUNNY),
                                 reason="bunny fixture not present")

# 128^2 flagship size (VERDICT r4 item 7); spp kept small to
# bound interpret-mode runtime on CPU CI
SIZE = 128
SPP = 2
DEPTH = 3


def _render(builder):
    from mcrt_tpu import RenderConfig, Renderer
    from mcrt_tpu.config import AccelType, BuilderType, BVHConfig, \
        IntegratorConfig
    from mcrt_tpu.scene.builders import heavy_gallery

    scene, camera = heavy_gallery()
    cfg = RenderConfig(
        width=SIZE, height=SIZE, spp=SPP, samples_per_pass=SPP,
        accel=AccelType.BLOCKED, bvh=BVHConfig(builder=builder),
        integrator=IntegratorConfig(max_depth=DEPTH),
    )
    return np.asarray(Renderer(scene, camera, cfg).render())


@needs_bunny
@pytest.mark.parametrize("builder_name", ["sah", "sbvh"])
def test_heavy_gallery_golden(builder_name):
    from mcrt_tpu.config import BuilderType

    img = _render(BuilderType(builder_name))
    assert np.isfinite(img).all()
    if not os.path.exists(GOLDEN):
        pytest.fail("golden missing: run tools/make_goldens.py")
    ref = np.load(GOLDEN)["image"].astype(np.float32)
    rel = np.abs(img - ref).mean() / max(float(ref.mean()), 1e-6)
    # SBVH packs different blocks than SAH; images must still agree — any
    # builder-dependent image difference is a traversal bug
    assert rel < 0.02, f"{builder_name}: mean-relative error {rel:.4f}"
