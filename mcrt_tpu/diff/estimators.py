"""Differentiable-rendering estimators and parameter plumbing.

New capability over the reference (it is not differentiable — SURVEY
BASELINE): the renderer differentiates end-to-end w.r.t. material, light, and
texture parameters.  Estimator choices (SURVEY §7 phase 7):

- **BSDF sampling**: detached (sample direction + pdf stop-gradient, smooth
  f attached) — applied inside ``bsdf.uber.sample`` — unbiased for material
  parameters through discrete lobe choice and wh sampling;
- **NEE / light sampling**: attached (reparameterized): the light sample
  point moves differentiably with light parameters and pdf = d²/(cosθ·A) is
  differentiated through — unbiased via change of variables in the fixed
  uniforms;
- **visibility / intersection**: treated as non-differentiable discrete
  events (no silhouette gradients in v1; reparameterized silhouettes are a
  later round).

This module provides the parameter-view helpers and an Adam-based inverse
renderer used by BASELINE config 5 (Cornell albedo/roughness/light
optimization).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..accel import Intersector, build_intersector
from ..camera.pinhole import PinholeCamera
from ..config import RenderConfig
from ..parallel.render import render_spp_batch
from ..scene.scene import Scene


class ParamView(NamedTuple):
    """A differentiable view over a subset of scene parameters."""

    get: Callable[[Scene], Any]
    set: Callable[[Scene, Any], Scene]


def material_params() -> ParamView:
    """Albedo + roughness of every material."""
    return ParamView(
        get=lambda s: {
            "diffuse": s.materials.diffuse,
            "roughness": s.materials.roughness,
        },
        set=lambda s, p: s.replace(
            materials=s.materials.replace(
                diffuse=jnp.clip(p["diffuse"], 0.0, 1.0),
                roughness=jnp.clip(p["roughness"], 1e-3, 1.0),
            )
        ),
    )


def light_params() -> ParamView:
    return ParamView(
        get=lambda s: {"intensity": s.lights.intensity},
        set=lambda s, p: s.replace(
            lights=s.lights.replace(intensity=jnp.maximum(p["intensity"], 0.0))
        ),
    )


def full_params() -> ParamView:
    m, l = material_params(), light_params()
    return ParamView(
        get=lambda s: {**m.get(s), **l.get(s)},
        set=lambda s, p: l.set(m.set(s, p), p),
    )


def light_geometry_params() -> ParamView:
    """Light position + direction (point/directional/disk lights).  The NEE
    estimator is reparameterized — the sampled light point moves
    differentiably with these parameters (module docstring), so gradients
    flow through Li = I/d², the d²/(cosθA) pdf, and the sampled direction.
    Visibility stays a detached discrete event."""

    def _set(s: Scene, p) -> Scene:
        d = p["direction"]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return s.replace(
            lights=s.lights.replace(position=p["position"], direction=d)
        )

    return ParamView(
        get=lambda s: {
            "position": s.lights.position,
            "direction": s.lights.direction,
        },
        set=_set,
    )


def with_float_texels(scene: Scene) -> Scene:
    """Populate the differentiable float texel override from the u8 atlas
    (prerequisite for ``texture_params``)."""
    tex = scene.textures
    if tex.num == 0 or tex.data_f is not None:
        return scene
    return scene.replace(
        textures=tex.replace(data_f=tex.data.astype(jnp.float32) / 255.0)
    )


def texture_params() -> ParamView:
    """Per-texel atlas view (all textures + their mip chains).  Bilinear /
    trilinear filtering is linear in the texels, so gradients distribute
    over the 4 (or 8) footprint corners with the filter weights.  Note the
    mip levels optimize independently in v1 (no downsample consistency
    constraint).  Call :func:`with_float_texels` on the scene first."""
    return ParamView(
        get=lambda s: {"texels": s.textures.data_f},
        set=lambda s, p: s.replace(
            textures=s.textures.replace(
                data_f=jnp.clip(p["texels"], 0.0, 1.0)
            )
        ),
    )


def render_loss_fn(
    camera: PinholeCamera,
    cfg: RenderConfig,
    intersector: Intersector,
    view: ParamView,
    mesh=None,
):
    """loss(params, scene, frames, target) = mean L2 over the rendered image."""

    def loss(params, scene, frames, target):
        scene_p = view.set(scene, params)
        img = render_spp_batch(scene_p, camera, frames, cfg, intersector, mesh)
        return jnp.mean((img - target.reshape(img.shape)) ** 2)

    return loss


class InverseRenderer:
    """Adam-based inverse renderer — optimizes scene parameters to match a
    target image (BASELINE config 5)."""

    def __init__(
        self,
        scene: Scene,
        camera: PinholeCamera,
        cfg: RenderConfig,
        view: ParamView | None = None,
        learning_rate: float = 5e-2,
        mesh=None,
    ):
        self.scene = scene
        self.cfg = cfg
        self.view = view or material_params()
        self.intersector = build_intersector(scene, cfg)
        self.loss_fn = render_loss_fn(camera, cfg, self.intersector, self.view, mesh)
        self.opt = optax.adam(learning_rate)

        @jax.jit
        def step(params, opt_state, scene_in, frames, target):
            loss, grads = jax.value_and_grad(self.loss_fn)(
                params, scene_in, frames, target
            )
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = step

    def run(self, target: jax.Array, steps: int = 100, spp_per_step: int = 4,
            seed: int = 1234, advance_frames: bool = True, callback=None):
        """advance_frames=False re-uses the same sample streams every step —
        deterministic optimization (useful when the target was rendered with
        the same seed; removes MC gradient noise entirely)."""
        params = self.view.get(self.scene)
        opt_state = self.opt.init(params)
        losses = []
        for i in range(steps):
            off = seed + i * spp_per_step if advance_frames else seed
            frames = jnp.arange(spp_per_step, dtype=jnp.int32) + off
            params, opt_state, loss = self._step(
                params, opt_state, self.scene, frames, target
            )
            losses.append(float(loss))
            if callback is not None:
                callback(i, params, float(loss))
        return self.view.set(self.scene, params), params, losses
