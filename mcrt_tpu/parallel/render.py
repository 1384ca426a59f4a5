"""Sharded rendering and gradient steps over a device mesh.

New capability (the reference is single-device, SURVEY §2e).  Idiomatic
GSPMD: the render is written once as array code; sharding annotations on the
per-sample radiance tensor (``P("spp", "rays")``) tell XLA to partition the
wavefront across chips, and the spp-mean / parameter-gradient reductions
lower to ``psum`` over ICI automatically — no hand-written collectives.

The gradient path (inverse rendering) is the renderer's "training step":
per-chip backward over its ray/spp shard, parameter grads all-reduced by XLA,
overlapped with the backward pass by the scheduler.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..accel import Intersector
from ..camera.pinhole import PinholeCamera
from ..config import RenderConfig
from ..renderer import render_sample
from ..scene.scene import Scene
from .mesh import RAYS_AXIS, SPP_AXIS


def render_spp_batch(
    scene: Scene,
    camera: PinholeCamera,
    frames: jax.Array,  # (S,) sample indices
    cfg: RenderConfig,
    intersector: Intersector,
    mesh: Mesh | None = None,
) -> jax.Array:
    """Render S samples of the full image at once; returns (N, 3) mean
    radiance.  With a mesh, the (S, N) sample×ray grid is sharded over
    (spp, rays) and the mean over S becomes a psum over the spp axis."""

    def per_sample(frame):
        radiance, _ = render_sample(scene, camera, frame, cfg, intersector)
        return radiance

    if mesh is None:
        # single device: sequential scan over samples.  vmap would batch
        # every gather in the integrator (measured ~14x slower per spp on
        # TPU: batched gathers defeat XLA's same-index coalescing); a scan
        # keeps each sample at the unbatched shapes the kernels are tuned
        # for while still amortizing dispatch into one program.
        out = jax.lax.map(per_sample, frames)  # (S, N, 3)
    else:
        # sharded over the spp axis: vmap gives XLA the batch dimension to
        # partition; each device still runs an unbatched per-sample slice.
        out = jax.vmap(per_sample)(frames)  # (S, N, 3)
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(SPP_AXIS, RAYS_AXIS, None))
        )
    return out.mean(0)


def make_sharded_render(
    scene: Scene,
    camera: PinholeCamera,
    cfg: RenderConfig,
    intersector: Intersector,
    mesh: Mesh,
) -> Callable[[Scene, jax.Array], jax.Array]:
    """jit-compiled sharded renderer: (scene, frames (S,)) -> (N, 3).

    The scene rides in as an argument (replicated) so material/light params
    stay differentiable inputs."""

    @functools.partial(jax.jit, static_argnums=())
    def fn(scene_in: Scene, frames: jax.Array) -> jax.Array:
        return render_spp_batch(scene_in, camera, frames, cfg, intersector, mesh)

    return fn


def make_train_step(
    camera: PinholeCamera,
    cfg: RenderConfig,
    intersector: Intersector,
    mesh: Mesh,
    param_get: Callable[[Scene], Any],
    param_set: Callable[[Scene, Any], Scene],
):
    """Inverse-rendering step: L2 image loss differentiated w.r.t. scene
    parameters (albedo/roughness/light intensity — BASELINE config 5).

    Returns jitted ``step(scene, frames, target) -> (loss, grads)`` where
    grads is a pytree shaped like ``param_get(scene)``.  Per-chip backward
    runs on the local ray/spp shard; XLA all-reduces the replicated-parameter
    gradients over the mesh (psum over both axes), overlapping with the
    backward computation.
    """

    def loss_fn(params, scene, frames, target):
        scene_p = param_set(scene, params)
        img = render_spp_batch(scene_p, camera, frames, cfg, intersector, mesh)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(scene: Scene, frames: jax.Array, target: jax.Array):
        params = param_get(scene)
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, frames, target)
        return loss, grads

    return step
