"""Bidirectional path tracer (BDPT), fully fused into one XLA program.

TPU-native redesign of the reference's BDPT (``assets/kernels/BDPT.cl`` +
host driver ``RTBDPTPass.cpp``, SURVEY §3.3): the reference launches 4 kernels
per stage with host loops and splats via CAS-loop float atomics
(``BDPT.cl:654-669``); here both subpath walks, every (s,t) connection
strategy, the MIS pdf-ratio walk, and the t=1 film splats compile into a
single jitted program — splats use ``scatter-add`` (XLA segmented sum), not
atomics, per SURVEY §5.

Structure follows the PBRT-v3 formulation the reference mirrors:

- camera subpath: ≤ maxDepth+2 vertices (``RTBDPTPass.cpp:456-457``);
- light subpath: ≤ maxDepth+1 vertices, transport-mode aware walk with the
  shading-normal correction factor (``BDPT.cl:23-36``);
- strategies: s=0 (camera path hits light), s=1 (NEE-style light resample),
  t=1 (connect to camera, film splat), and general (s≥2,t≥2) G-term
  connections (``BDPT.cl:460-646``);
- MIS: the pdfRev/pdfFwd ratio walk with remap0 delta handling
  (``BDPT.cl:649-875``).  Where the reference temporarily *mutates* vertices
  to apply strategy-specific endpoint pdfs, this implementation computes the
  four override densities functionally and substitutes them positionally in
  the (static) ratio loops — no mutation, no divergence.

Vertices are SoA arrays shaped (N, V, ...): fixed-size per-pixel vertex
storage exactly like the reference's preallocated vertex buffers.

Limitations (v1): directional lights participate only via the s=1 strategy
(they are not sampled for light subpaths); pinhole camera only (t=0 never
contributes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..bsdf import uber
from ..bsdf.materials import fetch_bsdf
from ..camera.pinhole import PinholeCamera
from ..config import IntegratorConfig
from ..core import math as m
from ..core.types import Rays
from ..lights import lights as lt
from ..sampling import rng
from ..scene.interaction import compute_interaction, spawn_ray
from ..scene.scene import LIGHT_DIRECTIONAL, LIGHT_POINT, Scene

VT_CAMERA = 0
VT_LIGHT = 1
VT_SURFACE = 2


class Vertices(struct.PyTreeNode):
    """SoA path-vertex storage, leading dims (N, V) — the functional
    analogue of ``RTBDPTVertex`` (``kernel_data.h:220-244``)."""

    vtype: jax.Array  # (N, V) i32
    p: jax.Array  # (N, V, 3)
    ng: jax.Array  # (N, V, 3)
    ns: jax.Array  # (N, V, 3)
    t: jax.Array  # (N, V, 3) shading tangent
    b: jax.Array  # (N, V, 3) shading bitangent
    uv: jax.Array  # (N, V, 2)
    wo: jax.Array  # (N, V, 3) toward previous vertex
    material: jax.Array  # (N, V) i32 (-1 none)
    light: jax.Array  # (N, V) i32 area light id at vertex (-1)
    light_idx: jax.Array  # (N, V) i32 light table id for VT_LIGHT vertices
    beta: jax.Array  # (N, V, 3) throughput up to (and incl. emission/We at) vertex
    pdf_fwd: jax.Array  # (N, V) area density from previous vertex
    pdf_rev: jax.Array  # (N, V) area density from next vertex
    delta: jax.Array  # (N, V) bool — vertex reached via delta sampling
    on_surface: jax.Array  # (N, V) bool — area-density conversions need cos
    valid: jax.Array  # (N, V) bool

    @classmethod
    def empty(cls, n: int, v: int):
        z3 = jnp.zeros((n, v, 3), jnp.float32)
        z = jnp.zeros((n, v), jnp.float32)
        zi = jnp.full((n, v), -1, jnp.int32)
        zb = jnp.zeros((n, v), bool)
        return cls(
            vtype=jnp.zeros((n, v), jnp.int32), p=z3, ng=z3, ns=z3, t=z3, b=z3,
            uv=jnp.zeros((n, v, 2), jnp.float32), wo=z3, material=zi, light=zi,
            light_idx=zi, beta=z3, pdf_fwd=z, pdf_rev=z, delta=zb,
            on_surface=zb, valid=zb,
        )

    def at(self, i: int):
        """Slice vertex i -> dict of (N, ...) arrays."""
        return jax.tree.map(lambda a: a[:, i], self)

    def set_vertex(self, i: int, **fields):
        out = self
        for k, v in fields.items():
            arr = getattr(out, k)
            out = out.replace(**{k: arr.at[:, i].set(v)})
        return out


def _convert_density(pdf_solid, from_p, to_p, to_ng, to_on_surface):
    """Solid-angle -> area density (``convertVertexDensity``,
    ``BDPT.cl:44-60``)."""
    d = to_p - from_p
    d2 = jnp.maximum(m.length_sq(d), 1e-12)
    w = d * jax.lax.rsqrt(d2)[..., None]
    cos = jnp.abs(m.dot(to_ng, w))
    factor = jnp.where(to_on_surface, cos, 1.0)
    return pdf_solid * factor / d2


class BsdfCache:
    """Per-vertex UberBSDF store (VERDICT r3 item 3a).

    The random walks fetch each vertex's material/texture data exactly once
    (they need it to sample the bounce anyway); strategies and the MIS walk
    reuse those fetches instead of re-gathering per (s,t) — the reference
    likewise pays one material fetch per kernel *stage*, not per strategy
    (``BDPT.cl:460-875``).  Falls back to an on-demand fetch for indices the
    walk never reached (e.g. the light-origin vertex)."""

    def __init__(self, scene: Scene, verts: Vertices):
        self._scene = scene
        self._verts = verts
        self._cache: dict[int, object] = {}

    def put(self, i: int, bsdf) -> None:
        self._cache[i] = bsdf

    def rebind(self, verts: Vertices) -> "BsdfCache":
        out = BsdfCache(self._scene, verts)
        out._cache = self._cache
        return out

    def at(self, i: int):
        if i not in self._cache:
            self._cache[i] = _fetch_vertex_bsdf(self._scene, self._verts, i)
        return self._cache[i], self._verts.at(i)


def _fetch_vertex_bsdf(scene: Scene, verts: Vertices, i: int):
    """Fetch the UberBSDF at vertex i (materials are SoA gathers)."""
    from ..core.types import Interaction

    v = verts.at(i)
    n = v.p.shape[0]
    it = Interaction(
        p=v.p, ng=v.ng, ns=v.ns, dpdu=v.t, dpdv=v.b, uv=v.uv, wo=v.wo,
        duvdx=jnp.zeros((n, 2)), duvdy=jnp.zeros((n, 2)),
        material=v.material, light=v.light, valid=v.valid,
    )
    bsdf, _ = fetch_bsdf(scene, it)
    return bsdf


def _bsdf_f_and_pdf(bs: BsdfCache, i, wi_world, both_dirs=False):
    """f and pdf at vertex i for world direction wi (wo from storage)."""
    bsdf, v = bs.at(i)
    wo_l = m.to_local(v.t, v.b, v.ns, v.wo)
    wi_l = m.to_local(v.t, v.b, v.ns, wi_world)
    f = uber.evaluate(bsdf, wo_l, wi_l)
    pdf = uber.pdf(bsdf, wo_l, wi_l)
    if not both_dirs:
        return f, pdf
    pdf_rev = uber.pdf(bsdf, wi_l, wo_l)
    return f, pdf, pdf_rev


def _vertex_pdf(bs: BsdfCache, i, next_p, next_ng, next_surf):
    """Area pdf of vertex i generating `next` given its stored wo
    (PBRT Vertex::Pdf for surface vertices)."""
    bsdf, v = bs.at(i)
    wi = m.normalize(next_p - v.p)
    wo_l = m.to_local(v.t, v.b, v.ns, v.wo)
    wi_l = m.to_local(v.t, v.b, v.ns, wi)
    pdf_solid = uber.pdf(bsdf, wo_l, wi_l)
    return _convert_density(pdf_solid, v.p, next_p, next_ng, next_surf)


def _pdf_light_dir(scene, verts, i, next_p, next_ng, next_surf):
    """Area pdf of light vertex i emitting toward `next` (PBRT PdfLight).

    Infinite (delta-direction) lights use the planar disk density
    1/(pi r^2) projected onto the receiver — never a 1/d^2 conversion."""
    v = verts.at(i)
    w = m.normalize(next_p - v.p)
    pdf_pos, pdf_dir = lt.pdf_le(scene, v.light_idx, v.ns, w)
    ltype = jnp.take(scene.lights.type, jnp.maximum(v.light_idx, 0), axis=0,
                     mode="clip")
    is_inf = (ltype == LIGHT_DIRECTIONAL) & (v.light_idx >= 0)
    pdf_area = _convert_density(pdf_dir, v.p, next_p, next_ng, next_surf)
    cos_next = jnp.where(next_surf, jnp.abs(m.dot(next_ng, w)), 1.0)
    return jnp.where(is_inf, pdf_pos * cos_next, pdf_area)


def _pdf_light_origin(scene, verts, i):
    """pdf_pos * choice pdf of the light vertex i being sampled as a light
    subpath origin (PBRT PdfLightOrigin)."""
    v = verts.at(i)
    num = jnp.maximum(scene.lights.num, 1).astype(jnp.float32)
    pdf_pos, _ = lt.pdf_le(scene, v.light_idx, v.ns, v.ns)  # dir unused for pos
    return pdf_pos / num


def _remap0(x):
    """``remap0``: treat 0 pdfs as 1 in MIS ratios (delta handling)."""
    return jnp.where(x != 0.0, x, 1.0)


def _g_term(a_p, a_ns, b_p, b_ns):
    d = b_p - a_p
    d2 = jnp.maximum(m.length_sq(d), 1e-12)
    w = d * jax.lax.rsqrt(d2)[..., None]
    return jnp.abs(m.dot(a_ns, w)) * jnp.abs(m.dot(b_ns, w)) / d2


def random_walk(
    scene: Scene,
    rays: Rays,
    beta: jax.Array,
    pdf_dir: jax.Array,
    stream: rng.SampleStream,
    verts: Vertices,
    start_index: int,
    n_steps: int,
    importance_mode: bool,
    cfg: IntegratorConfig,
    intersect,
):
    """Extend a subpath by up to n_steps surface vertices (PBRT RandomWalk /
    ``GenerateSecondaryVertices``, ``BDPT.cl:317-458``).  Returns the
    vertices plus a ``BsdfCache`` carrying each step's material fetch for
    reuse by the connection strategies."""
    active = rays.active
    prev_i = start_index - 1
    bsdfs: dict[int, object] = {}

    for step in range(n_steps):
        i = start_index + step
        hit = intersect(scene, rays)
        alive = active & hit.valid
        it = compute_interaction(scene, rays, hit)
        bsdf, it = fetch_bsdf(scene, it)
        bsdfs[i] = bsdf

        pv = verts.at(i - 1)
        pdf_fwd = _convert_density(pdf_dir, pv.p, it.p, it.ng, jnp.ones_like(hit.valid))

        verts = verts.set_vertex(
            i,
            vtype=jnp.full_like(hit.prim, VT_SURFACE),
            p=it.p, ng=it.ng, ns=it.ns, t=it.dpdu, b=it.dpdv, uv=it.uv,
            wo=it.wo, material=it.material, light=it.light,
            beta=jnp.where(alive[:, None], beta, 0.0),
            pdf_fwd=jnp.where(alive, pdf_fwd, 0.0),
            on_surface=alive,
            valid=alive,
        )

        u_bsdf, stream = rng.next_3d(stream)
        wo_l = m.to_local(it.dpdu, it.dpdv, it.ns, it.wo)
        bs = uber.sample(bsdf, wo_l, u_bsdf)
        wi_w = m.to_world(it.dpdu, it.dpdv, it.ns, bs.wi)

        # reverse pdf of the PREVIOUS vertex (direction wi -> wo swapped)
        wi_l = bs.wi
        pdf_rev_solid = uber.pdf(bsdf, wi_l, wo_l)
        pdf_rev_solid = jnp.where(bs.is_specular, 0.0, pdf_rev_solid)
        prev_rev = _convert_density(
            pdf_rev_solid, it.p, pv.p, pv.ng, pv.on_surface,
        )
        verts = verts.set_vertex(
            i - 1, pdf_rev=jnp.where(alive, prev_rev, verts.pdf_rev[:, i - 1])
        )

        cos_wi = jnp.abs(m.dot(it.ns, wi_w))
        w_mul = bs.f * m.safe_div(cos_wi, bs.pdf)[..., None]
        if importance_mode:
            # shading-normal correction (BDPT.cl:23-36)
            num = jnp.abs(m.dot(it.wo, it.ns)) * jnp.abs(m.dot(wi_w, it.ng))
            den = jnp.abs(m.dot(it.wo, it.ng)) * jnp.abs(m.dot(wi_w, it.ns))
            w_mul = w_mul * m.safe_div(num, den)[..., None]
        new_beta = beta * w_mul
        extend = alive & bs.valid & ~m.is_black(new_beta)
        rays = spawn_ray(it, wi_w, cfg.trace_offset, cfg.max_trace_distance, extend)
        pdf_dir = jnp.where(bs.is_specular, 0.0, bs.pdf)
        beta = jnp.where(extend[:, None], new_beta, 0.0)
        active = extend
        # a vertex's delta flag records how it was REACHED: mark vertex i+1
        if i + 1 < verts.delta.shape[1]:
            verts = verts.replace(
                delta=verts.delta.at[:, i + 1].set(
                    jnp.where(extend, bs.is_specular, False)
                )
            )
    cache = BsdfCache(scene, verts)
    for i, b in bsdfs.items():
        cache.put(i, b)
    return verts, stream, cache


def generate_camera_subpath(scene, camera, rays, stream, n_verts, cfg, intersect):
    n = rays.n
    verts = Vertices.empty(n, n_verts)
    _, pdf_dir = camera.pdf_we(rays.d)
    verts = verts.set_vertex(
        0,
        vtype=jnp.full((n,), VT_CAMERA, jnp.int32),
        p=jnp.broadcast_to(camera.position, (n, 3)),
        ng=jnp.broadcast_to(camera.forward, (n, 3)),
        ns=jnp.broadcast_to(camera.forward, (n, 3)),
        beta=jnp.ones((n, 3), jnp.float32),
        pdf_fwd=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    beta = jnp.ones((n, 3), jnp.float32)
    verts, stream, cache = random_walk(
        scene, rays, beta, pdf_dir, stream, verts, 1, n_verts - 1,
        importance_mode=False, cfg=cfg, intersect=intersect,
    )
    return verts, stream, cache.rebind(verts)


def generate_light_subpath(scene, stream, n_verts, cfg, intersect, n):
    verts = Vertices.empty(n, n_verts)
    u_pick, stream = rng.next_1d(stream)
    u_pos, stream = rng.next_2d(stream)
    u_dir, stream = rng.next_2d(stream)
    l_idx, pdf_choice = lt.pick_light(scene.lights, u_pick)
    le = lt.sample_le(scene, l_idx, u_pos, u_dir)
    ltype = jnp.take(scene.lights.type, jnp.maximum(l_idx, 0), axis=0, mode="clip")
    # directional lights walk too: origin sampled on a scene-radius disk
    # outside the scene with pdf_pos = 1/(pi r^2), delta direction
    # (``lights.cl:148-224`` walks them the same way)
    usable = le.valid & (scene.lights.num > 0)

    pdf_origin = le.pdf_pos * pdf_choice
    beta0 = le.le / jnp.maximum(pdf_origin, 1e-20)[:, None]
    tl, bl = m.build_orthonormal_basis(le.n)
    is_inf = ltype == LIGHT_DIRECTIONAL
    verts = verts.set_vertex(
        0,
        vtype=jnp.full((n,), VT_LIGHT, jnp.int32),
        p=le.p, ng=le.n, ns=le.n, t=tl, b=bl,
        light_idx=jnp.where(usable, l_idx, -1),
        beta=jnp.where(usable[:, None], beta0, 0.0),
        # infinite (delta-direction) lights: the origin's spatial density is
        # the directional density of re-sampling it, 0 for a delta light
        # (PBRT InfiniteLightDensity); remap0 turns it into 1 in MIS ratios
        pdf_fwd=jnp.where(usable & ~is_inf, pdf_origin, 0.0),
        # the delta FIELD records how a vertex was REACHED and is always
        # False for light origins (PBRT Vertex::CreateLight); whether the
        # LIGHT itself is delta is recovered from its type in _mis_weight
        delta=jnp.zeros((n,), bool),
        valid=usable,
    )
    from ..scene.scene import LIGHT_DISK, LIGHT_MESH
    on_surf0 = (ltype == LIGHT_DISK) | (ltype == LIGHT_MESH)
    verts = verts.set_vertex(0, on_surface=on_surf0 & usable)
    cos0 = jnp.abs(m.dot(le.n, le.d))
    cos0 = jnp.where(ltype == LIGHT_POINT, 1.0, cos0)
    beta1 = beta0 * m.safe_div(cos0, le.pdf_dir)[:, None]
    rays = Rays(
        o=le.p + le.n * jnp.where((ltype == LIGHT_POINT)[:, None], 0.0, cfg.trace_offset),
        d=le.d,
        tmin=jnp.zeros((n,), jnp.float32),
        tmax=jnp.full((n,), cfg.max_trace_distance, jnp.float32),
        active=usable,
    )
    verts, stream, cache = random_walk(
        scene, rays, beta1, le.pdf_dir, stream, verts, 1, n_verts - 1,
        importance_mode=True, cfg=cfg, intersect=intersect,
    )
    # infinite (delta-direction) lights: the first surface vertex's forward
    # density is the planar disk density 1/(pi r^2) projected onto the
    # surface — not a solid-angle conversion of the delta direction pdf
    # (PBRT GenerateLightSubpath's infinite-light correction)
    if n_verts > 1:
        v1 = verts.at(1)
        pdf1_inf = le.pdf_pos * jnp.abs(m.dot(le.d, v1.ng))
        verts = verts.replace(
            pdf_fwd=verts.pdf_fwd.at[:, 1].set(
                jnp.where(is_inf & v1.valid, pdf1_inf, verts.pdf_fwd[:, 1])
            )
        )
    return verts, stream, cache.rebind(verts)


def _mis_weight(scene, camera, cam: Vertices, light: Vertices, s: int, t: int,
                cam_bs: BsdfCache | None = None,
                light_bs: BsdfCache | None = None):
    """Balance-heuristic MIS weight for strategy (s, t) — the functional
    version of the reference's temporary-mutation ratio walk
    (``BDPT.cl:649-875``).  ``cam_bs``/``light_bs`` carry the walk-time
    material fetches (BsdfCache); missing caches fetch on demand."""
    if s + t == 2:
        return jnp.ones((cam.p.shape[0],), jnp.float32)
    cam_bs = cam_bs if cam_bs is not None else BsdfCache(scene, cam)
    light_bs = light_bs if light_bs is not None else BsdfCache(scene, light)

    pt = cam.at(t - 1)
    pt_minus = cam.at(t - 2) if t >= 2 else None
    qs = light.at(s - 1) if s >= 1 else None

    n = cam.p.shape[0]
    surf = jnp.ones((n,), bool)

    # override densities (the four endpoint rewrites)
    if s > 0:
        if s > 1:
            # qs is a surface vertex with stored wo toward qs_minus
            pt_rev = _vertex_pdf(light_bs, s - 1, pt.p, pt.ng, surf)
        else:
            pt_rev = _pdf_light_dir(scene, light, 0, pt.p, pt.ng, surf)
    else:
        # s == 0: pt sits on a light; origin pdf
        pt_rev = _pdf_light_origin_at(scene, cam, t - 1)

    if t > 1:
        if s > 0:
            # pdf of pt generating pt_minus given incoming from qs:
            # evaluate pt's bsdf with wo'=dir(pt->qs), wi=dir(pt->pt_minus)
            pt_minus_rev = _pdf_from_new_wo(
                cam_bs, t - 1, qs.p, pt_minus.p, pt_minus.ng,
                pt_minus.on_surface,
            )
        else:
            # light at pt emits toward pt_minus
            pt_minus_rev = _pdf_light_dir_at_surface(
                scene, cam, t - 1, pt_minus.p, pt_minus.ng,
                pt_minus.on_surface,
            )
    else:
        pt_minus_rev = None

    if s > 0:
        if t > 1:
            qs_rev = _pdf_from_new_wo(
                cam_bs, t - 1, pt_minus.p, qs.p, qs.ng, surf
            )
        else:
            # t == 1: camera generates qs
            w = m.normalize(qs.p - camera.position)
            _, pdf_dir = camera.pdf_we(w)
            qs_rev = _convert_density(pdf_dir, camera.position, qs.p, qs.ng, surf)
    else:
        qs_rev = None
    if s > 1:
        qs_minus = light.at(s - 2)
        qs_minus_rev = _pdf_from_new_wo(
            light_bs, s - 1, pt.p, qs_minus.p, qs_minus.ng,
            qs_minus.on_surface,
        )
    else:
        qs_minus_rev = None

    sum_ri = jnp.zeros((n,), jnp.float32)

    # camera side: i = t-1 .. 1 (PBRT: connection endpoints are never delta)
    ri = jnp.ones((n,), jnp.float32)
    for i in range(t - 1, 0, -1):
        rev = cam.pdf_rev[:, i]
        if i == t - 1:
            rev = pt_rev
        elif i == t - 2 and pt_minus_rev is not None:
            rev = pt_minus_rev
        ri = ri * _remap0(rev) / _remap0(cam.pdf_fwd[:, i])
        d_i = jnp.zeros((n,), bool) if i == t - 1 else cam.delta[:, i]
        use = ~(d_i | cam.delta[:, i - 1])
        sum_ri = sum_ri + jnp.where(use & cam.valid[:, i], ri, 0.0)

    # light side: i = s-1 .. 0.  The i=0 strategy ("connect to the light
    # origin") does not exist for delta lights: point lights (delta
    # position) and directional lights (delta direction) both exclude it —
    # PBRT's IsDeltaLight(), recovered here from the light's type.
    ri = jnp.ones((n,), jnp.float32)
    if s > 0:
        l_idx0 = light.light_idx[:, 0]
        ltype0 = jnp.take(scene.lights.type, jnp.maximum(l_idx0, 0), axis=0,
                          mode="clip")
        is_delta_light0 = (
            (ltype0 == LIGHT_POINT) | (ltype0 == LIGHT_DIRECTIONAL)
        ) & (l_idx0 >= 0)
    for i in range(s - 1, -1, -1):
        rev = light.pdf_rev[:, i]
        if i == s - 1 and qs_rev is not None:
            rev = qs_rev
        elif i == s - 2 and qs_minus_rev is not None:
            rev = qs_minus_rev
        ri = ri * _remap0(rev) / _remap0(light.pdf_fwd[:, i])
        d_i = jnp.zeros((n,), bool) if i == s - 1 else light.delta[:, i]
        if i > 0:
            use = ~(d_i | light.delta[:, i - 1])
        else:
            use = ~(d_i | is_delta_light0)
        sum_ri = sum_ri + jnp.where(use & light.valid[:, i], ri, 0.0)

    return 1.0 / (1.0 + sum_ri)


def _pdf_from_new_wo(bs: BsdfCache, i, new_prev_p, next_p, next_ng, next_surf):
    """Vertex i's bsdf pdf with wo REPLACED by dir(i -> new_prev), target
    next — the functional form of the reference's temporary wo mutation."""
    bsdf, v = bs.at(i)
    wo = m.normalize(new_prev_p - v.p)
    wi = m.normalize(next_p - v.p)
    wo_l = m.to_local(v.t, v.b, v.ns, wo)
    wi_l = m.to_local(v.t, v.b, v.ns, wi)
    pdf_solid = uber.pdf(bsdf, wo_l, wi_l)
    return _convert_density(pdf_solid, v.p, next_p, next_ng, next_surf)


def _pdf_light_dir_at_surface(scene, verts, i, next_p, next_ng, next_surf):
    """Surface vertex i that IS an area light: emission dir pdf toward next."""
    v = verts.at(i)
    w = m.normalize(next_p - v.p)
    _, pdf_dir = lt.pdf_le(scene, jnp.maximum(v.light, 0), v.ns, w)
    pdf_dir = jnp.where(v.light >= 0, pdf_dir, 0.0)
    return _convert_density(pdf_dir, v.p, next_p, next_ng, next_surf)


def _pdf_light_origin_at(scene, verts, i):
    v = verts.at(i)
    num = jnp.maximum(scene.lights.num, 1).astype(jnp.float32)
    pdf_pos, _ = lt.pdf_le(scene, jnp.maximum(v.light, 0), v.ns, v.ns)
    return jnp.where(v.light >= 0, pdf_pos / num, 0.0)


def trace(
    scene: Scene,
    camera: PinholeCamera,
    rays: Rays,
    stream: rng.SampleStream,
    cfg: IntegratorConfig,
    intersect,
    occluded,
    s1_only: bool = False,
    film: tuple[int, int] | None = None,
    slot_of_pixel: jax.Array | None = None,
):
    """Full BDPT estimate for one wavefront. Returns (N, 3) radiance
    including splatted t=1 contributions (accumulated via scatter-add).

    s1_only reproduces the forward path tracer (the reference's
    ``SHOW_REGULAR_PATH_TRACER_RESULTS`` cross-check, ``BDPT.cl:18``).

    ``film`` is the (W, H) resolution used to address t=1 film splats
    (``ConnectVertices`` atomic splats, ``BDPT.cl:654-669``); defaults to a
    square film of sqrt(n) for direct callers.  ``slot_of_pixel`` maps a
    row-major pixel index to the ray slot carrying that pixel — the renderer
    traces rays in Morton order, so splats must land in the slot that the
    caller's inverse permutation will send back to the right pixel."""
    n = rays.n
    t_max = cfg.max_depth + 2
    s_max = cfg.max_depth + 1

    cam, stream, cam_bs = generate_camera_subpath(
        scene, camera, rays, stream, t_max, cfg, intersect
    )
    light, stream, light_bs = generate_light_subpath(
        scene, stream, s_max, cfg, intersect, n
    )

    L = jnp.zeros((n, 3), jnp.float32)
    # deferred visibility: every strategy emits (srays, weighted contrib,
    # ok mask, optional splat routing); ONE batched occlusion query then
    # resolves them all — the reference's exact shape (PrepareConnections
    # emits all connection rays, one QueryOcclusion over
    # numPaths*(t(t+1)/2-2) rays, ConnectVertices applies visibility,
    # RTBDPTPass.cpp:309-347).
    pending: list[tuple] = []

    for t in range(1, t_max + 1):
        for s in range(0, s_max + 1):
            depth = s + t - 2
            if depth < 0 or depth > cfg.max_depth:
                continue
            if t == 1 and s == 1:
                continue  # light directly visible to camera: covered by s=0? no—skip (pinhole)
            if s1_only and s != 1:
                continue
            if t == 1:
                if s1_only:
                    continue
                pending.append(_strategy_t1(
                    scene, camera, light, light_bs, s, cfg, stream, n,
                    film=film, slot_of_pixel=slot_of_pixel,
                ))
            elif s == 0:
                L = L + _strategy_s0(scene, camera, cam, light, t, cfg,
                                     s1_only, cam_bs, light_bs)
            elif s == 1:
                entry, stream = _strategy_s1(
                    scene, camera, cam, cam_bs, light, t, cfg, stream,
                    s1_only,
                )
                pending.append(entry)
            else:
                pending.append(_strategy_connect(
                    scene, camera, cam, cam_bs, light, light_bs, s, t, cfg
                ))

    if pending:
        all_rays = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0),
            *[p[0] for p in pending],
        )
        blocked = occluded(scene, all_rays)
        for k, (srays, contrib, ok, flat) in enumerate(pending):
            vis = ok & ~blocked[k * n:(k + 1) * n]
            masked = jnp.where(vis[:, None], contrib, 0.0)
            if flat is None:
                L = L + masked
            else:
                L = L.at[flat].add(masked)
    return L


def _strategy_s0(scene, camera, cam: Vertices, light, t, cfg, s1_only,
                 cam_bs=None, light_bs=None):
    """Camera subpath hit a light (``PrepareConnections`` s=0 branch)."""
    pt = cam.at(t - 1)
    is_light = pt.valid & (pt.light >= 0)
    le = lt.eval_le(scene, pt.light, pt.ns, pt.wo)
    contrib = pt.beta * le
    w = _mis_weight(scene, camera, cam, light, 0, t, cam_bs, light_bs)
    return jnp.where(is_light[:, None], contrib * w[:, None], 0.0)


def _strategy_s1(scene, camera, cam: Vertices, cam_bs, light, t, cfg,
                 stream, s1_only):
    """Resample a light for the camera vertex (NEE inside BDPT).  Returns a
    pending-visibility entry (srays, weighted contrib, ok, None)."""
    pt = cam.at(t - 1)
    u_pick, stream = rng.next_1d(stream)
    u_light, stream = rng.next_2d(stream)
    l_idx, pdf_choice = lt.pick_light(scene.lights, u_pick)
    ls = lt.sample_li(scene, l_idx, pt.p, u_light)

    bsdf, _ = cam_bs.at(t - 1)
    wo_l = m.to_local(pt.t, pt.b, pt.ns, pt.wo)
    wi_l = m.to_local(pt.t, pt.b, pt.ns, ls.wi)
    f = uber.evaluate(bsdf, wo_l, wi_l)
    cos_i = jnp.abs(m.dot(pt.ns, ls.wi))
    ok = (
        pt.valid & (pt.vtype == VT_SURFACE) & ls.valid
        & ~m.is_black(f) & (scene.lights.num > 0)
    )
    # one-sided geometric check
    front = (m.dot(pt.ng, ls.wi) * m.dot(pt.ng, pt.wo)) > 0.0
    ok = ok & front

    from ..scene.interaction import spawn_shadow_ray
    from ..core.types import Interaction

    it = Interaction(
        p=pt.p, ng=pt.ng, ns=pt.ns, dpdu=pt.t, dpdv=pt.b, uv=pt.uv, wo=pt.wo,
        duvdx=jnp.zeros_like(pt.uv), duvdy=jnp.zeros_like(pt.uv),
        material=pt.material, light=pt.light, valid=pt.valid,
    )
    srays = spawn_shadow_ray(it, ls.wi, ls.dist, cfg.trace_offset, ok)

    contrib = pt.beta * f * ls.li * m.safe_div(cos_i, ls.pdf * pdf_choice)[:, None]
    if s1_only:
        w = jnp.ones_like(cos_i)
    else:
        # sampled light vertex for MIS: build a 1-vertex light path view
        sampled = Vertices.empty(pt.p.shape[0], 1)
        tl, bl = m.build_orthonormal_basis(ls.n)
        pdf_pos, _ = lt.pdf_le(scene, l_idx, ls.n, ls.wi)
        sampled = sampled.set_vertex(
            0,
            vtype=jnp.full_like(l_idx, VT_LIGHT), p=ls.p, ng=ls.n, ns=ls.n,
            t=tl, b=bl, light_idx=l_idx,
            on_surface=~ls.is_delta,
            beta=ls.li * m.safe_div(jnp.ones_like(ls.pdf), ls.pdf * pdf_choice)[:, None],
            pdf_fwd=pdf_pos * pdf_choice,
            delta=ls.is_delta,
            valid=ok,
        )
        w = _mis_weight(scene, camera, cam, sampled, 1, t, cam_bs, None)
    return (srays, contrib * w[:, None], ok, None), stream


def _strategy_t1(scene, camera, light: Vertices, light_bs, s, cfg, stream, n,
                 film=None, slot_of_pixel=None):
    """Connect light vertex s-1 to the camera; splat at the projected pixel
    (``ConnectVertices`` t=1 + atomic splats -> scatter-add).  Returns a
    pending-visibility entry (srays, weighted contrib, ok, splat_index)."""
    qs = light.at(s - 1)
    wi, dist, we, pdf_cam, uv, inside = camera.sample_wi(qs.p)
    ok = qs.valid & (qs.vtype == VT_SURFACE) & inside & (we > 0.0)

    bsdf, _ = light_bs.at(s - 1)
    wo_l = m.to_local(qs.t, qs.b, qs.ns, qs.wo)
    wi_l = m.to_local(qs.t, qs.b, qs.ns, wi)
    f = uber.evaluate(bsdf, wo_l, wi_l)
    # importance-mode shading normal correction at the connection
    num = jnp.abs(m.dot(qs.wo, qs.ns)) * jnp.abs(m.dot(wi, qs.ng))
    den = jnp.abs(m.dot(qs.wo, qs.ng)) * jnp.abs(m.dot(wi, qs.ns))
    f = f * m.safe_div(num, den)[:, None]
    cos_i = jnp.abs(m.dot(qs.ns, wi))
    ok = ok & ~m.is_black(f)

    from ..core.types import Interaction
    from ..scene.interaction import spawn_shadow_ray

    it = Interaction(
        p=qs.p, ng=qs.ng, ns=qs.ns, dpdu=qs.t, dpdv=qs.b, uv=qs.uv, wo=qs.wo,
        duvdx=jnp.zeros_like(qs.uv), duvdy=jnp.zeros_like(qs.uv),
        material=qs.material, light=qs.light, valid=qs.valid,
    )
    srays = spawn_shadow_ray(it, wi, dist, cfg.trace_offset, ok)

    contrib = qs.beta * f * (we * m.safe_div(cos_i, pdf_cam))[:, None]
    cam1 = Vertices.empty(n, 1).set_vertex(
        0,
        vtype=jnp.full((n,), VT_CAMERA, jnp.int32),
        p=jnp.broadcast_to(camera.position, (n, 3)),
        ng=jnp.broadcast_to(camera.forward, (n, 3)),
        ns=jnp.broadcast_to(camera.forward, (n, 3)),
        beta=jnp.ones((n, 3), jnp.float32),
        pdf_fwd=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    w = _mis_weight(scene, camera, cam1, light, s, 1, None, light_bs)
    contrib = contrib * w[:, None]

    # splat routing: scatter-add into the flat pixel grid (v=0 bottom row).
    # pixel layout must match camera/pinhole.pixel_uv: idx = row*W + col
    # derived from uv; the film resolution comes from the caller (falls back
    # to a square sqrt(n) film for direct trace() users).
    if film is not None:
        w_img, h_img = film
    else:
        import math as pymath

        w_img = int(pymath.isqrt(n))
        h_img = n // w_img
    px = jnp.clip((uv[:, 0] * w_img).astype(jnp.int32), 0, w_img - 1)
    py = jnp.clip((uv[:, 1] * h_img).astype(jnp.int32), 0, h_img - 1)
    flat = py * w_img + px
    if slot_of_pixel is not None:
        # rays are a permutation of pixels: route the splat to the ray slot
        # that the caller's inverse permutation maps back to pixel `flat`
        flat = jnp.take(slot_of_pixel, flat, axis=0)
    return (srays, contrib, ok, flat)


def _strategy_connect(scene, camera, cam: Vertices, cam_bs, light: Vertices,
                      light_bs, s, t, cfg):
    """General (s>=2, t>=2) connection with geometric term G
    (``PrepareConnections``/``ConnectVertices`` s,t>=2 branch).  Returns a
    pending-visibility entry (srays, weighted contrib, ok, None)."""
    pt = cam.at(t - 1)
    qs = light.at(s - 1)
    ok = (
        pt.valid & qs.valid
        & (pt.vtype == VT_SURFACE) & (qs.vtype == VT_SURFACE)
    )
    d = qs.p - pt.p
    d2 = jnp.maximum(m.length_sq(d), 1e-12)
    dist = jnp.sqrt(d2)
    w_pt_to_qs = d / dist[:, None]

    f_pt, _ = _bsdf_f_and_pdf(cam_bs, t - 1, w_pt_to_qs)
    f_qs, _ = _bsdf_f_and_pdf(light_bs, s - 1, -w_pt_to_qs)
    # importance-mode correction at qs
    num = jnp.abs(m.dot(qs.wo, qs.ns)) * jnp.abs(m.dot(-w_pt_to_qs, qs.ng))
    den = jnp.abs(m.dot(qs.wo, qs.ng)) * jnp.abs(m.dot(-w_pt_to_qs, qs.ns))
    f_qs = f_qs * m.safe_div(num, den)[:, None]

    g = _g_term(pt.p, pt.ns, qs.p, qs.ns)
    contrib = pt.beta * f_pt * g[:, None] * f_qs * qs.beta
    ok = ok & ~m.is_black(contrib)

    from ..core.types import Interaction
    from ..scene.interaction import spawn_shadow_ray

    it = Interaction(
        p=pt.p, ng=pt.ng, ns=pt.ns, dpdu=pt.t, dpdv=pt.b, uv=pt.uv, wo=pt.wo,
        duvdx=jnp.zeros_like(pt.uv), duvdy=jnp.zeros_like(pt.uv),
        material=pt.material, light=pt.light, valid=pt.valid,
    )
    srays = spawn_shadow_ray(it, w_pt_to_qs, dist, cfg.trace_offset, ok)

    w = _mis_weight(scene, camera, cam, light, s, t, cam_bs, light_bs)
    return (srays, contrib * w[:, None], ok, None)
