"""Flat device scene.

The TPU analog of the reference's scene upload (CudaRenderer::loadScene
+ setup, src/cudaRenderer.cu:1679-2113): the static scene is flattened
into dense float32/int32 SoA arrays — primitives in BVH-sorted order
(like getSortedPrimitives feeding CuTriangle upload,
src/cudaRenderer.cu:1760-1792), a tagged BSDF table (CuBSDF,
src/cudaRenderer.h:135-140, extended beyond the reference's
diffuse/mirror pair to refraction/glass/emission), a light table
(CuEmitter, src/cudaRenderer.h:126-133 — the reference supports exactly
one area light, cudaRenderer.cu:1734-1754; we support a mixed list), and
the flat wide BVH (CuBVHSubTree arrays + level lists).

Everything is a flax.struct pytree of jnp arrays, so the whole scene is
one jit argument and one host->HBM upload.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax import struct

from ..accel.bvh import BVHAccel
from ..accel.wide import FlatWideBVH, build_flat_wide_bvh
from ..scene import static_scene as st
from ..scene.bsdf import (
    BSDF_DIFFUSE,
    BSDF_EMISSION,
    BSDF_GLASS,
    BSDF_MIRROR,
    BSDF_REFRACTION,
    DiffuseBSDF,
    EmissionBSDF,
    GlassBSDF,
    MirrorBSDF,
    RefractionBSDF,
)

# primitive type tags
PRIM_TRI = 0
PRIM_SPHERE = 1

# light type tags
LIGHT_AREA = 0
LIGHT_POINT = 1
LIGHT_DIRECTIONAL = 2
LIGHT_HEMISPHERE = 3
LIGHT_SPOT = 4
LIGHT_ENV = 5


@struct.dataclass
class FlatBVH:
    """Device wide-BVH arrays (CuBVHSubTree, src/cudaRenderer.h:142-153,
    plus the level lists of src/cudaRenderer.cu:1794-1840)."""

    outlets: jnp.ndarray  # [N, W] int32, -1 = none
    child_min: jnp.ndarray  # [N, W, 3] f32
    child_max: jnp.ndarray  # [N, W, 3] f32
    leaf_start: jnp.ndarray  # [N] int32
    leaf_range: jnp.ndarray  # [N] int32 (>0 iff leaf)
    #: packed per-node row for the traversal hot path (one wide gather):
    #: [cmin[W,3] (3W), cmax[W,3] (3W), outlets as f32 (W; -1 = none),
    #: leaf_start, leaf_range, child_is_leaf flags (W)] = 8W+2 f32,
    #: zero-padded to a multiple of 8
    node_packed: jnp.ndarray  # [N, pad8(8W+2)] f32
    # static metadata (not traced)
    levels: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)
    #: per level: flattened child-validity pattern (outlets >= 0) of the
    #: level's nodes in order — static schedule metadata for the Pallas
    #: wavefront (levels[l+1] == valid children of levels[l], preorder)
    level_child_valid: Tuple[Tuple[bool, ...], ...] = struct.field(
        pytree_node=False
    )
    #: per level: leaf-ness of each node, in level order (static)
    level_is_leaf: Tuple[Tuple[bool, ...], ...] = struct.field(
        pytree_node=False
    )
    #: per-level (inner-node count, leaf-node count) — sizes the static
    #: per-level queue capacities under jit
    level_inner: Tuple[int, ...] = struct.field(pytree_node=False)
    level_leaf: Tuple[int, ...] = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    max_leaf: int = struct.field(pytree_node=False)
    root_is_leaf: bool = struct.field(pytree_node=False)
    #: static segment schedule for the fused wavefront kernels
    #: (ops/pallas/wavefront2.py).  Tuple over levels; each level is
    #: (seg_nodes[S], child_kind[S*W], child_pair[S*W],
    #:  child_lstart[S*W], child_lcnt[S*W], child_forced[S*W]) where
    #: kind 0 = empty slot, 1 = inner child (pair = index into the next
    #: level's segment list), 2 = leaf child (lstart/lcnt index the
    #: BVH-sorted primitive array).  Derived from the preorder-DFS
    #: child-order invariant of BVHSubTree::compress
    #: (reference src/bvh.cpp:234-273).
    wf_sched: Tuple = struct.field(pytree_node=False, default=())
    #: packet-DFS node blocks (ops/pallas/packet_dfs.py): one 128-col
    #: row per child slot, 8 per node, in the kernel's own BFS node
    #: numbering; cols [mnx mny mnz mxx mxy mxz].  Child slots list the
    #: node's inner children first (ids inner_base..inner_base+k-1 per
    #: node_meta), then its leaf children; dead slots carry inverted
    #: boxes so the slab test always misses them.
    node_dfs: jnp.ndarray = None  # [8*Nd, 128] f32
    #: packet-DFS prim-group table: 8 prims per row, 16 f32 fields each
    #: [g.xyz g.w T1.xyzw T2.xyzw type orig_id pad pad] — the same
    #: precomputed intersection fields as prim_packed cols 10:22 (g =
    #: plane normal|center, g.w = plane offset|radius, T1/T2 the
    #: barycentric affine rows), ordered by per-node leaf run (all
    #: direct leaf-child prims of one node contiguous, runs 8-aligned);
    #: orig_id maps to the BVH-sorted prim arrays
    prim_groups: jnp.ndarray = None  # [G, 128] f32
    #: packet-DFS per-node scalars, flattened [Nd, 4] i32 -> [4*Nd]:
    #: [inner_base, inner_count, leaf_grp0, leaf_count]; lives in SMEM
    #: via scalar prefetch so the kernel's control flow never touches
    #: vector registers
    node_meta: jnp.ndarray = None  # [4*Nd] i32

    @property
    def num_levels(self) -> int:
        return len(self.levels)


@struct.dataclass
class FlatScene:
    """Complete device scene."""

    # primitives, BVH-sorted (CuTriangle upload order)
    prim_type: jnp.ndarray  # [P] int32
    v0: jnp.ndarray  # [P, 3] f32 (sphere: center)
    v1: jnp.ndarray  # [P, 3] f32 (sphere: [radius, 0, 0])
    v2: jnp.ndarray  # [P, 3] f32
    n0: jnp.ndarray  # [P, 3] f32 vertex normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    prim_bsdf: jnp.ndarray  # [P] int32

    # BSDF table (CuBSDF extended)
    bsdf_fn: jnp.ndarray  # [B] int32
    bsdf_albedo: jnp.ndarray  # [B, 3] f32
    bsdf_radiance: jnp.ndarray  # [B, 3] f32
    bsdf_ior: jnp.ndarray  # [B] f32

    # light table (CuEmitter extended with a type tag)
    light_type: jnp.ndarray  # [L] int32
    light_radiance: jnp.ndarray  # [L, 3] f32
    light_position: jnp.ndarray  # [L, 3] f32
    light_direction: jnp.ndarray  # [L, 3] f32
    light_dim_x: jnp.ndarray  # [L, 3] f32
    light_dim_y: jnp.ndarray  # [L, 3] f32
    light_area: jnp.ndarray  # [L] f32

    #: packed per-primitive row for the traversal hot path: columns
    #: [v0.xyz, v1.xyz, v2.xyz, type, g.xyz, g.w, T1.xyzw, T2.xyzw]
    #: (22 f32 used of 128).  Cols 10:22 are the PRECOMPUTED
    #: intersection fields shared by every traversal backend
    #: (ops/intersect.packed_prim_test): g = unnormalized plane normal
    #: (triangle) / center (sphere), g.w = plane offset n.v0 / radius,
    #: and T1/T2 the affine barycentric rows u = T1.(h,1), v = T2.(h,1)
    #: — precomputed host-side in f64 so the per-leaf-visit cross
    #: products of intersectRayTriangle (src/cudaRenderer.cu:217-270)
    #: never run on-device (VERDICT r4 task 1).  One wide-row gather
    #: hits XLA's fast gather emitter; narrow per-field gathers fused
    #: into loop fusions serialize on TPU.
    prim_packed: jnp.ndarray  # [P, 128] f32
    #: packed per-primitive SHADING row: [v0.xyz v1.xyz v2.xyz type
    #: n0.xyz n1.xyz n2.xyz bsdf pad...] (32 f32) — compute_hits does
    #: one wide-row gather instead of eight narrow ones (XLA TPU
    #: gathers cost ~the row count regardless of width)
    shade_packed: jnp.ndarray  # [P, 32] f32

    bvh: FlatBVH

    #: environment light (lat-long radiance map + flat luminance-sin
    #: CDF/PDF for importance sampling); 1x1 zeros when absent
    env_map: jnp.ndarray  # [H, W, 3] f32
    env_cdf: jnp.ndarray  # [H*W] f32
    env_pdf: jnp.ndarray  # [H*W] f32

    num_lights: int = struct.field(pytree_node=False)
    #: static copy of light_type, usable for trace-time dispatch
    light_kinds: Tuple[int, ...] = struct.field(pytree_node=False)
    has_env: bool = struct.field(pytree_node=False)

    #: seed-prim rows for conservative t_ub seeding (ops/seeds.py): the
    #: K largest-area primitives as prim_packed cols 0:22 + orig id at
    #: col 22 (24 f32).  Any subset of the real scene yields a valid
    #: upper bound on the closest hit, so a dense brute-force test
    #: against these rows bounds the wavefront traversal's search: only
    #: strictly-closer hits are logged (shrinking the scatter merge)
    #: and boxes beyond the bound are never descended (shrinking the
    #: queues).  In box-like scenes (walls/floor/ceiling dominate by
    #: area) most rays' seed IS their final hit.
    seed_rows: jnp.ndarray = None  # [K, 24] f32

    @property
    def num_prims(self) -> int:
        return self.v0.shape[0]


def _bsdf_record(b) -> Tuple[int, np.ndarray, np.ndarray, float]:
    if isinstance(b, DiffuseBSDF):
        return BSDF_DIFFUSE, b.albedo, np.zeros(3), 1.0
    if isinstance(b, MirrorBSDF):
        return BSDF_MIRROR, b.reflectance, np.zeros(3), 1.0
    if isinstance(b, RefractionBSDF):
        return BSDF_REFRACTION, b.transmittance, np.zeros(3), b.ior
    if isinstance(b, GlassBSDF):
        # albedo slot carries transmittance; reflectance folded via ior
        return BSDF_GLASS, b.transmittance, b.reflectance, b.ior
    if isinstance(b, EmissionBSDF):
        # the reference flattens emitters as fn=0 with radiance
        # (cudaRenderer.cu:1705-1713); we tag them explicitly
        return BSDF_EMISSION, np.zeros(3), b.radiance, 1.0
    raise TypeError(f"unsupported BSDF {type(b)}")


def _build_wf_schedule(flat) -> Tuple:
    """Static per-level segment schedule for the fused wavefront kernels.

    Segments are the *inner* nodes of each level, in level (= preorder)
    order; leaf children are intersected inline at their parent's
    segment, so leaf nodes never become segments.  Returns a tuple over
    levels of (seg_nodes, child_kind, child_pair, child_lstart,
    child_lcnt, child_forced) flat int tuples.
    """
    W = flat.width
    leaf_range = flat.leaf_range
    leaf_start = flat.leaf_start
    outlets = flat.outlets

    if leaf_range[0] > 0:  # root is a leaf: one virtual segment
        kind = [2] + [0] * (W - 1)
        return ((
            (0,),
            tuple(kind),
            tuple([-1] * W),
            tuple([int(leaf_start[0])] + [0] * (W - 1)),
            tuple([int(leaf_range[0])] + [0] * (W - 1)),
            tuple([1] + [0] * (W - 1)),
        ),)

    sched = []
    inner_per_level = [
        [int(n) for n in lv if leaf_range[n] == 0] for lv in flat.levels
    ]
    for lvl, inner in enumerate(inner_per_level):
        if not inner:
            break
        nxt = (
            {n: i for i, n in enumerate(inner_per_level[lvl + 1])}
            if lvl + 1 < len(inner_per_level)
            else {}
        )
        kinds, pairs, lstarts, lcnts = [], [], [], []
        for n in inner:
            for w in range(W):
                o = int(outlets[n, w])
                if o < 0:
                    kinds.append(0)
                    pairs.append(-1)
                    lstarts.append(0)
                    lcnts.append(0)
                elif leaf_range[o] > 0:
                    kinds.append(2)
                    pairs.append(-1)
                    lstarts.append(int(leaf_start[o]))
                    lcnts.append(int(leaf_range[o]))
                else:
                    kinds.append(1)
                    pairs.append(nxt[o])
                    lstarts.append(0)
                    lcnts.append(0)
        sched.append((
            tuple(inner),
            tuple(kinds),
            tuple(pairs),
            tuple(lstarts),
            tuple(lcnts),
            tuple([0] * (len(inner) * W)),
        ))
    return tuple(sched)


def flatten_scene(
    scene: st.Scene,
    tree_width: int = 4,
    max_leaf_size: int = 32,
    sah_bins: int = 12,
) -> Tuple[FlatScene, BVHAccel]:
    """Flatten a static scene: build the SAH BVH over all primitives
    (triangles + spheres) and emit device arrays in BVH order."""
    tri_v: List[np.ndarray] = []
    tri_n: List[np.ndarray] = []
    tri_bsdf: List[np.ndarray] = []
    sph_c: List[np.ndarray] = []
    sph_r: List[float] = []
    sph_bsdf: List[int] = []

    bsdfs: List = []

    def bsdf_index(b) -> int:
        for i, x in enumerate(bsdfs):
            if x is b:
                return i
        bsdfs.append(b)
        return len(bsdfs) - 1

    for obj in scene.objects:
        if isinstance(obj, st.Mesh):
            if obj.num_triangles() == 0:
                continue
            v, n = obj.triangle_arrays()
            tri_v.append(v)
            tri_n.append(n)
            tri_bsdf.append(np.full(len(v), bsdf_index(obj.get_bsdf()), np.int32))
        elif isinstance(obj, st.SphereObject):
            sph_c.append(obj.o)
            sph_r.append(obj.r)
            sph_bsdf.append(bsdf_index(obj.get_bsdf()))

    T = sum(len(v) for v in tri_v)
    S = len(sph_c)
    P = T + S
    if P == 0:
        raise ValueError("scene has no primitives")
    if P >= 1 << 24:
        # the traversal hot path carries primitive indices as exact f32
        # integers; above 2^24 they would round silently
        raise ValueError(
            f"scene has {P} primitives; the float32-payload traversal "
            f"supports at most 2^24-1 (= 16,777,215)"
        )

    v0 = np.zeros((P, 3), np.float64)
    v1 = np.zeros((P, 3), np.float64)
    v2 = np.zeros((P, 3), np.float64)
    n0 = np.zeros((P, 3), np.float64)
    n1 = np.zeros((P, 3), np.float64)
    n2 = np.zeros((P, 3), np.float64)
    ptype = np.zeros(P, np.int32)
    pbsdf = np.zeros(P, np.int32)

    if T:
        tv = np.concatenate(tri_v)
        tn = np.concatenate(tri_n)
        v0[:T], v1[:T], v2[:T] = tv[:, 0], tv[:, 1], tv[:, 2]
        n0[:T], n1[:T], n2[:T] = tn[:, 0], tn[:, 1], tn[:, 2]
        pbsdf[:T] = np.concatenate(tri_bsdf)
    if S:
        centers = np.stack(sph_c)
        radii = np.asarray(sph_r)
        ptype[T:] = PRIM_SPHERE
        v0[T:] = centers
        v1[T:, 0] = radii
        pbsdf[T:] = np.asarray(sph_bsdf, np.int32)

    # primitive bounds: padded triangle bbox (triangle.cpp:38-46) /
    # sphere bbox
    pmin = np.where(
        (ptype == PRIM_TRI)[:, None],
        np.minimum(np.minimum(v0, v1), v2) - st.Triangle.PADDING,
        v0 - v1[:, :1],
    )
    pmax = np.where(
        (ptype == PRIM_TRI)[:, None],
        np.maximum(np.maximum(v0, v1), v2) + st.Triangle.PADDING,
        v0 + v1[:, :1],
    )

    bvh = BVHAccel(pmin, pmax, max_leaf_size=max_leaf_size, sah_bins=sah_bins)
    order = bvh.get_sorted_order()
    flat = build_flat_wide_bvh(bvh, tree_width)

    # --- precomputed intersection fields (VERDICT r4 task 1) ---
    # Every traversal backend runs the SAME precomputed-table prim test
    # (ops/intersect.packed_prim_test), so the per-triangle terms that
    # depend only on geometry — the unnormalized plane normal n, the
    # plane offset n.v0, and the two barycentric affine rows — are
    # computed ONCE here in f64 and cast to f32, instead of re-deriving
    # them per leaf visit per ray on-device (intersectRayTriangle
    # recomputes two edge vectors + a cross product per test,
    # src/cudaRenderer.cu:217-270; round 4 measured that recompute at
    # ~320 ms/frame in the packet-DFS depths).  Barycentric rows: with
    # A = [e1 e2 n] (columns), (u, v, s) = A^-1 (p - v0), so
    # u = r1.p + t1w with r1 = (e2 x n)/|n|^2, t1w = -r1.v0 (and
    # r2 = (n x e1)/|n|^2 for v).  Degenerate triangles get zero rows;
    # their zero normal always trips the parallel rejection.
    ptype_o = ptype[order]
    v0o, v1o, v2o = v0[order], v1[order], v2[order]
    e1_ = v1o - v0o
    e2_ = v2o - v0o
    nrm_ = np.cross(e1_, e2_)
    det_ = (nrm_ * nrm_).sum(1)
    safe_ = det_ > 0.0
    inv_det = 1.0 / np.where(safe_, det_, 1.0)
    r1_ = np.where(safe_[:, None], np.cross(e2_, nrm_) * inv_det[:, None], 0.0)
    r2_ = np.where(safe_[:, None], np.cross(nrm_, e1_) * inv_det[:, None], 0.0)
    is_sph_o = ptype_o == PRIM_SPHERE
    # g = plane normal (tri) / center (sphere); g.w = n.v0 / radius
    g_vec = np.where(is_sph_o[:, None], v0o, nrm_).astype(np.float32)
    g_w = np.where(
        is_sph_o, v1o[:, 0], (nrm_ * v0o).sum(1)
    ).astype(np.float32)
    t1_row = np.concatenate(
        [r1_, -(r1_ * v0o).sum(1)[:, None]], axis=1
    ).astype(np.float32)
    t2_row = np.concatenate(
        [r2_, -(r2_ * v0o).sum(1)[:, None]], axis=1
    ).astype(np.float32)
    t1_row[is_sph_o] = 0.0
    t2_row[is_sph_o] = 0.0

    # BSDF table
    B = max(len(bsdfs), 1)
    bfn = np.zeros(B, np.int32)
    balbedo = np.zeros((B, 3), np.float64)
    brad = np.zeros((B, 3), np.float64)
    bior = np.ones(B, np.float64)
    for i, b in enumerate(bsdfs):
        bfn[i], balbedo[i], brad[i], bior[i] = _bsdf_record(b)

    # light table
    lt, lrad, lpos, ldir, ldx, ldy, larea = [], [], [], [], [], [], []
    for light in scene.lights:
        if isinstance(light, st.AreaLight):
            lt.append(LIGHT_AREA)
            lrad.append(light.radiance)
            lpos.append(light.position)
            ldir.append(light.direction)
            ldx.append(light.dim_x)
            ldy.append(light.dim_y)
            larea.append(light.area)
        elif isinstance(light, st.PointLight):
            lt.append(LIGHT_POINT)
            lrad.append(light.radiance)
            lpos.append(light.position)
            ldir.append(np.zeros(3))
            ldx.append(np.zeros(3))
            ldy.append(np.zeros(3))
            larea.append(0.0)
        elif isinstance(light, st.DirectionalLight):
            lt.append(LIGHT_DIRECTIONAL)
            lrad.append(light.radiance)
            lpos.append(np.zeros(3))
            ldir.append(light.dirToLight)
            ldx.append(np.zeros(3))
            ldy.append(np.zeros(3))
            larea.append(0.0)
        elif isinstance(light, st.InfiniteHemisphereLight):
            lt.append(LIGHT_HEMISPHERE)
            lrad.append(light.radiance)
            lpos.append(np.zeros(3))
            ldir.append(np.zeros(3))
            ldx.append(np.zeros(3))
            ldy.append(np.zeros(3))
            larea.append(0.0)
        elif isinstance(light, st.SpotLight):
            lt.append(LIGHT_SPOT)
            lrad.append(light.radiance)
            lpos.append(light.position)
            ldir.append(light.direction)
            ldx.append(np.zeros(3))
            ldy.append(np.zeros(3))
            larea.append(float(light.angle))
        elif isinstance(light, st.EnvironmentLight):
            lt.append(LIGHT_ENV)
            lrad.append(np.ones(3))
            lpos.append(np.zeros(3))
            ldir.append(np.zeros(3))
            ldx.append(np.zeros(3))
            ldy.append(np.zeros(3))
            larea.append(0.0)
        # MeshLight is empty in the reference (light.cpp:107-113)

    # environment map tables (host light precomputes pdf/cdf)
    env_light = next(
        (l for l in scene.lights if isinstance(l, st.EnvironmentLight)), None
    )
    if env_light is not None:
        env_map = env_light.envmap
        env_pdf = env_light._pdf
        env_cdf = env_light._cdf
    else:
        env_map = np.zeros((1, 1, 3))
        env_pdf = np.ones(1)
        env_cdf = np.ones(1)

    num_device_lights = len(lt)
    if not lt:  # keep shapes static with one dead light
        lt, lrad, lpos, ldir, ldx, ldy, larea = (
            [LIGHT_POINT],
            [np.zeros(3)],
            [np.zeros(3)],
            [np.zeros(3)],
            [np.zeros(3)],
            [np.zeros(3)],
            [0.0],
        )

    # convert dtype in NUMPY, then device-put: jnp.asarray(x, dtype=..)
    # on a f64 host array dispatches a convert_element_type program per
    # table (~9 s of device round-trips at 80k prims)
    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))  # noqa: E731
    i32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.int32))  # noqa: E731

    level_inner = tuple(
        int((flat.leaf_range[lv] == 0).sum()) for lv in flat.levels
    )
    level_child_valid = tuple(
        tuple(bool(x) for x in (flat.outlets[lv] >= 0).reshape(-1))
        for lv in flat.levels
    )
    level_is_leaf = tuple(
        tuple(bool(x) for x in (flat.leaf_range[lv] > 0))
        for lv in flat.levels
    )
    level_leaf = tuple(
        int((flat.leaf_range[lv] > 0).sum()) for lv in flat.levels
    )
    w = flat.width
    child_clipped = np.clip(flat.outlets, 0, len(flat.outlets) - 1)
    child_is_leaf = (flat.leaf_range[child_clipped] > 0) & (flat.outlets >= 0)
    node_packed = np.concatenate(
        [
            flat.child_min.reshape(-1, 3 * w),
            flat.child_max.reshape(-1, 3 * w),
            flat.outlets.astype(np.float32),
            flat.leaf_start[:, None].astype(np.float32),
            flat.leaf_range[:, None].astype(np.float32),
            child_is_leaf.astype(np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    # pad rows to 128 columns: Pallas DMA slices must be lane-tile
    # (128) aligned on the minor dimension
    pad_cols = (-node_packed.shape[1]) % 128
    if pad_cols:
        node_packed = np.concatenate(
            [node_packed, np.zeros((len(node_packed), pad_cols), np.float32)],
            axis=1,
        )
    # --- packet-DFS tables (ops/pallas/packet_dfs.py) ---
    # The DFS kernel uses its own node numbering (BFS order, so the
    # inner children of any node are consecutive) and its own prim
    # ordering (each node's direct leaf-child prims form one contiguous
    # "leaf run", so a visit does at most ONE leaf job).  Three tables:
    #
    # * node_dfs [8*Nd, 128] f32: one row per child slot, 8 per node,
    #   cols [mnx mny mnz mxx mxy mxz] (dead slots get inverted boxes).
    #   Child w of dfs-node n is row 8n+w; children are ordered inner
    #   children first (matching the BFS numbering), then leaf children.
    # * node_meta [4*Nd] i32 (SMEM scalar-prefetch): per node
    #   [inner_base, inner_count, leaf_grp0, leaf_count] — inner child
    #   ids are inner_base..inner_base+inner_count-1; the leaf run is
    #   leaf_count prims starting at prim-group row leaf_grp0 (8-prim
    #   groups, run start always 8-aligned by construction).
    # * prim_groups [G, 128] f32: 8 prims per row, 16 fields each:
    #   [v0.xyz v1.xyz v2.xyz type orig_id pad...] in leaf-run order;
    #   orig_id maps back to the BVH-sorted prim arrays.
    n_nodes = len(flat.outlets)
    outl = flat.outlets
    lr_all = flat.leaf_range
    ls_all = flat.leaf_start

    if w > 8:
        # the packet-DFS node block is one 8-row register per node;
        # wider trees fall back to the wavefront kernels / XLA scan
        # (cfg.traversal='dfs' raises a clear error for them)
        node_dfs = np.zeros((8, 128), np.float32)
        node_meta = np.full((4,), -1, np.int32)
        prim_groups = np.zeros((1, 128), np.float32)
    else:
        # Fully vectorized construction (round 4: the old per-node /
        # per-8-prim-group Python loops dominated large-scene flatten —
        # 12.3 s at 178k tris vs the reference's 0.48 s dragon build,
        # reference_results/performance.txt:23).  Semantics are
        # byte-identical to the loop form (checked against snapshots of
        # the loop's tables on bunny/terrain at both tree widths).
        if lr_all[0] > 0:
            # degenerate single-leaf tree: one pseudo-node whose only
            # slot is an always-hit box over the whole root leaf run
            is_root_leaf_dfs = True
            bfs = np.zeros(1, np.int64)
        else:
            is_root_leaf_dfs = False
            # BFS over inner nodes, children in slot order: each level
            # is the previous level's inner children flattened row-major
            frontier = np.zeros(1, np.int64)
            lvls = [frontier]
            while True:
                ch = outl[frontier].reshape(-1)
                ch = ch[ch >= 0]
                ch = ch[lr_all[ch] == 0].astype(np.int64)
                if len(ch) == 0:
                    break
                lvls.append(ch)
                frontier = ch
            bfs = np.concatenate(lvls)
        Nd = len(bfs)

        blk = np.zeros((Nd, 8, 128), np.float32)
        blk[:, :, 0:3] = 1e30  # dead slots: inverted boxes always miss
        blk[:, :, 3:6] = -1e30
        meta = np.zeros((Nd, 4), np.int64)

        if is_root_leaf_dfs:
            ln = np.zeros(1, np.int64)  # leaf child -> bfs node
            pos_l = np.zeros(1, np.int64)  # leaf child -> slot position
            leaf_lo = np.asarray([int(ls_all[0])], np.int64)
            leaf_cnt = np.asarray([int(lr_all[0])], np.int64)
            box_lmin = np.full((1, 3), -3e30)
            box_lmax = np.full((1, 3), 3e30)
            nl_per = np.ones(1, np.int64)
        else:
            outl_b = outl[bfs]  # [Nd, W]
            validc = outl_b >= 0
            ch_clip = np.clip(outl_b, 0, None)
            leaf_mask = validc & (lr_all[ch_clip] > 0)
            inner_mask = validc & ~leaf_mask
            ni = inner_mask.sum(axis=1).astype(np.int64)
            nl_per = leaf_mask.sum(axis=1).astype(np.int64)
            cmin_b = flat.child_min[bfs]
            cmax_b = flat.child_max[bfs]

            # slot positions: inner children first (slot order), then
            # leaf children (slot order)
            inn, inw = np.nonzero(inner_mask)  # row-major
            pos_i = (np.cumsum(inner_mask, axis=1) - 1)[inn, inw]
            blk[inn, pos_i, 0:3] = cmin_b[inn, inw]
            blk[inn, pos_i, 3:6] = cmax_b[inn, inw]

            ln, lw = np.nonzero(leaf_mask)  # row-major = emit order
            pos_l = ni[ln] + (np.cumsum(leaf_mask, axis=1) - 1)[ln, lw]
            lids = outl_b[ln, lw]
            leaf_lo = ls_all[lids].astype(np.int64)
            leaf_cnt = lr_all[lids].astype(np.int64)
            box_lmin = cmin_b[ln, lw]
            box_lmax = cmax_b[ln, lw]

            # inner-child BFS ids are assigned in discovery order =
            # (parent bfs rank, slot) — i.e. 1 + running inner count
            first_inner = 1 + np.concatenate(
                ([0], np.cumsum(ni)[:-1])
            )
            meta[:, 0] = np.where(ni > 0, first_inner, 0)
            meta[:, 1] = ni

        # 8-aligned prim groups per leaf child, in emit (row-major)
        # order; pad prims get type -1 (degenerate, never hit)
        ngr = (leaf_cnt + 7) // 8
        G = int(ngr.sum())
        gstart = np.concatenate(([0], np.cumsum(ngr)))[:-1]
        if G:
            grp_leaf = np.repeat(np.arange(len(ngr)), ngr)
            base = leaf_lo[grp_leaf] + 8 * (
                np.arange(G) - gstart[grp_leaf]
            )
            idx = base[:, None] + np.arange(8)
            vmask = idx < (leaf_lo + leaf_cnt)[grp_leaf][:, None]
            idx_c = np.where(vmask, idx, 0)
            m3 = vmask[:, :, None]
            pg = np.zeros((G, 8, 16), np.float32)
            pg[:, :, 0:3] = np.where(m3, g_vec[idx_c], 0.0)
            pg[:, :, 3] = np.where(vmask, g_w[idx_c], 0.0)
            pg[:, :, 4:8] = np.where(m3, t1_row[idx_c], 0.0)
            pg[:, :, 8:12] = np.where(m3, t2_row[idx_c], 0.0)
            pg[:, :, 12] = np.where(vmask, ptype_o[idx_c], -1.0)
            pg[:, :, 13] = np.where(vmask, idx, 0.0)
            pg_flat = pg.reshape(G, 128)
        else:
            pg_flat = np.zeros((1, 128), np.float32)
        # guard rows: leaf DMAs fetch 4-row batches
        prim_groups = np.concatenate(
            [pg_flat, np.zeros((4, 128), np.float32)]
        )

        # leaf slots carry (grp0, ngroups); per-node leaf job =
        # (first leaf child's grp0, total groups) — all leaf children
        # of a node emit consecutive 8-aligned group runs
        blk[ln, pos_l, 0:3] = box_lmin
        blk[ln, pos_l, 3:6] = box_lmax
        blk[ln, pos_l, 6] = gstart
        blk[ln, pos_l, 7] = ngr
        if len(ngr):
            first_leaf = np.concatenate(([0], np.cumsum(nl_per)[:-1]))
            meta[:, 2] = np.where(
                nl_per > 0, gstart[np.minimum(first_leaf, len(ngr) - 1)], 0
            )
            meta[:, 3] = np.bincount(
                ln, weights=ngr, minlength=Nd
            ).astype(np.int64)

        node_dfs = blk.reshape(Nd * 8, 128)
        node_meta = meta.reshape(-1).astype(np.int32)

    flat_bvh = FlatBVH(
        outlets=i32(flat.outlets),
        child_min=f32(flat.child_min),
        child_max=f32(flat.child_max),
        leaf_start=i32(flat.leaf_start),
        leaf_range=i32(flat.leaf_range),
        node_packed=f32(node_packed),
        node_dfs=f32(node_dfs),
        prim_groups=f32(prim_groups),
        node_meta=i32(node_meta),
        levels=tuple(tuple(int(i) for i in lv) for lv in flat.levels),
        level_child_valid=level_child_valid,
        level_is_leaf=level_is_leaf,
        level_inner=level_inner,
        level_leaf=level_leaf,
        width=flat.width,
        max_leaf=max(flat.max_leaf_range, 1),
        root_is_leaf=bool(flat.leaf_range[0] > 0),
        wf_sched=_build_wf_schedule(flat),
    )

    # packed prim rows padded to 128 columns (Pallas lane-tile DMA
    # alignment) with max_leaf_size degenerate rows appended so the leaf
    # kernel's static-size [max_leaf, 128] DMA never overruns the table
    # f32 from the start: a (P, 128) f64 staging table is 0.5 GB at
    # 500k prims and its post-hoc .astype copy dominated large-scene
    # flatten (assignment from f64 downcasts element-wise — identical
    # values)
    prim_packed = np.zeros((P + max_leaf_size + 8, 128), np.float32)
    prim_packed[:P, 0:3] = v0[order]
    prim_packed[:P, 3:6] = v1[order]
    prim_packed[:P, 6:9] = v2[order]
    prim_packed[:P, 9] = ptype[order]
    prim_packed[:P, 10:13] = g_vec
    prim_packed[:P, 13] = g_w
    prim_packed[:P, 14:18] = t1_row
    prim_packed[:P, 18:22] = t2_row

    shade_packed = np.zeros((P, 32), np.float32)
    shade_packed[:, 0:3] = v0[order]
    shade_packed[:, 3:6] = v1[order]
    shade_packed[:, 6:9] = v2[order]
    shade_packed[:, 9] = ptype[order]
    shade_packed[:, 10:13] = n0[order]
    shade_packed[:, 13:16] = n1[order]
    shade_packed[:, 16:19] = n2[order]
    shade_packed[:, 19] = pbsdf[order]

    # seed rows: the K largest-area prims (area = the occlusion each
    # contributes; triangles 0.5|e1 x e2|, spheres pi r^2 projected
    # disc), BVH-order ids so results join the normal prim arrays.
    # Layout = prim_packed cols 0:22 (incl. the precomputed fields, so
    # the seed sweep runs the same packed_prim_test) + orig id at 22.
    tri_area = 0.5 * np.sqrt(det_)
    sph_area = np.pi * v1o[:, 0] ** 2
    area = np.where(ptype_o == 0, tri_area, sph_area)
    K = int(min(32, P))
    seed_ids = np.argsort(-area, kind="stable")[:K]
    seed_rows = np.zeros((max(K, 1), 24), np.float32)
    if K:
        seed_rows[:, 0:22] = prim_packed[seed_ids, 0:22]
        seed_rows[:, 22] = seed_ids.astype(np.float32)

    fscene = FlatScene(
        prim_type=i32(ptype[order]),
        v0=f32(v0[order]),
        v1=f32(v1[order]),
        v2=f32(v2[order]),
        n0=f32(n0[order]),
        n1=f32(n1[order]),
        n2=f32(n2[order]),
        prim_bsdf=i32(pbsdf[order]),
        prim_packed=f32(prim_packed),
        shade_packed=f32(shade_packed),
        bsdf_fn=i32(bfn),
        bsdf_albedo=f32(balbedo),
        bsdf_radiance=f32(brad),
        bsdf_ior=f32(bior),
        light_type=i32(lt),
        light_radiance=f32(np.stack(lrad)),
        light_position=f32(np.stack(lpos)),
        light_direction=f32(np.stack(ldir)),
        light_dim_x=f32(np.stack(ldx)),
        light_dim_y=f32(np.stack(ldy)),
        light_area=f32(larea),
        bvh=flat_bvh,
        env_map=f32(env_map),
        env_cdf=f32(env_cdf),
        env_pdf=f32(env_pdf),
        num_lights=num_device_lights,
        light_kinds=tuple(int(t) for t in lt),
        has_env=env_light is not None,
        seed_rows=f32(seed_rows),
    )
    return fscene, bvh
