"""CPU path tracer with the Scotty3D PathTracer API surface.

Mirrors src/pathtracer.{h,cpp}: the INIT/READY/VISUALIZE/RENDERING/DONE
state machine (pathtracer.h:196-202), the 32x32-tile work queue drained
by worker threads (pathtracer.cpp:195-213, 537-558; src/work_queue.h),
set_scene/set_camera/set_frame_size/update_screen, save_image
(pathtracer.cpp:577-591), and the BVH visualize mode with node descent
(pathtracer.cpp:249-392).

Where the reference's integrator was a starter stub (trace_ray's
L_out=(5,5,5) override, pathtracer.cpp:395-497), this one is the real
thing: a vectorized numpy integrator with NEE + BSDF sampling matching
the device path's math — it serves as the framework's correctness
oracle ("the CPU cross-check the reference lacked", SURVEY.md section
4).  The TPU wavefront engine is the fast path; this is the reference
implementation, exactly inverting the reference repo's roles.
"""

from __future__ import annotations

import enum
import queue
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from ..config import RenderConfig
from ..scene import static_scene as st
from ..scene.bsdf import (
    BSDF_DIFFUSE,
    BSDF_EMISSION,
    BSDF_GLASS,
    BSDF_MIRROR,
    BSDF_REFRACTION,
)
from ..scene.camera import Camera
from .flatscene import PRIM_SPHERE


class State(enum.Enum):
    """PathTracer states (src/pathtracer.h:196-202)."""

    INIT = 0
    READY = 1
    VISUALIZE = 2
    RENDERING = 3
    DONE = 4


class WorkQueue:
    """Thread-safe work queue (src/work_queue.h:11-50)."""

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()

    def put_work(self, item, count: int = 1) -> None:
        for _ in range(count):
            self._q.put(item)

    def get_work(self):
        try:
            return self._q.get_nowait()
        except queue.Empty:
            return None

    def clear(self) -> None:
        while self.get_work() is not None:
            pass


class WorkItem:
    """One tile (src/pathtracer.h companion struct)."""

    def __init__(self, tile_x: int, tile_y: int, tile_w: int, tile_h: int):
        self.tile_x, self.tile_y = tile_x, tile_y
        self.tile_w, self.tile_h = tile_w, tile_h


class PathTracer:
    """Tile-scheduled CPU renderer with the Scotty3D surface."""

    TILE = 32  # 32x32 tiles (pathtracer.cpp:201-205)

    def __init__(self, ns_aa: int = 8, max_ray_depth: int = 4,
                 ns_area_light: int = 1, num_threads: int = 4,
                 max_leaf_size: int = 4):
        self.state = State.INIT
        self.ns_aa = ns_aa
        self.max_ray_depth = max_ray_depth
        self.ns_area_light = ns_area_light
        self.num_threads = num_threads
        self.max_leaf_size = max_leaf_size
        self.camera: Optional[Camera] = None
        self.scene: Optional[st.Scene] = None
        self.w = self.h = 0
        self.sample_buffer: Optional[np.ndarray] = None
        self.work_queue = WorkQueue()
        self.workers: List[threading.Thread] = []
        self._tiles_done = 0
        self._tiles_total = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # visualize-mode state (pathtracer.cpp:249-392)
        self.selection_history: List = []
        self._flat = None

    # -- configuration (pathtracer.cpp:71-127) ---------------------------
    def set_scene(self, scene: st.Scene) -> None:
        self.scene = scene
        self._build_accel()
        if self.camera is not None and self.w:
            self.state = State.READY

    def set_camera(self, camera: Camera) -> None:
        self.camera = camera
        if self.scene is not None and self.w:
            self.state = State.READY

    def set_frame_size(self, width: int, height: int) -> None:
        self.w, self.h = width, height
        self.sample_buffer = np.zeros((height, width, 3), dtype=np.float64)
        #: per-pixel squared standard error of the pixel-mean estimate
        #: (sample variance / ns_aa) — enables z-tests against other
        #: estimators of the same integral (tests/test_radiance.py)
        self.se2_buffer = np.zeros((height, width, 3), dtype=np.float64)
        if self.scene is not None and self.camera is not None:
            self.state = State.READY

    def _build_accel(self) -> None:
        """BVH build (build_accel, pathtracer.cpp:215-239)."""
        from .flatscene import flatten_scene

        flat, bvh = flatten_scene(self.scene, max_leaf_size=self.max_leaf_size)
        self._flat = {
            k: np.asarray(getattr(flat, k))
            for k in (
                "prim_type", "v0", "v1", "v2", "n0", "n1", "n2",
                "prim_bsdf", "bsdf_fn", "bsdf_albedo", "bsdf_radiance",
                "bsdf_ior",
            )
        }
        self._bvh = bvh
        self.selection_history = [bvh.root]

    # -- BVH visualization (pathtracer.cpp:249-392) ----------------------
    def visualize_accel(self) -> np.ndarray:
        """Depth-shaded wireframe of the currently selected BVH node's
        children — the headless analog of the GL visualize mode."""
        node = self.selection_history[-1]
        img = np.zeros((self.h or 256, self.w or 256, 3), np.float32)
        boxes = []
        if node.l is not None:
            boxes.append((node.l.bb_min, node.l.bb_max, (1.0, 0.3, 0.3)))
        if node.r is not None:
            boxes.append((node.r.bb_min, node.r.bb_max, (0.3, 0.3, 1.0)))
        boxes.append((node.bb_min, node.bb_max, (1.0, 1.0, 1.0)))
        cam = self.camera
        if cam is None:
            return img
        h, w, _ = img.shape
        for bmin, bmax, color in boxes:
            corners = np.array(
                [[bmin[0] if i & 1 else bmax[0],
                  bmin[1] if i & 2 else bmax[1],
                  bmin[2] if i & 4 else bmax[2]] for i in range(8)]
            )
            w2c = cam.c2w.T
            rel = (corners - cam.pos) @ w2c.T
            z = -rel[:, 2]
            ok = z > 1e-6
            import math as m

            sx = rel[:, 0] / np.where(ok, z, 1) / m.tan(m.radians(cam.hFov) / 2)
            sy = rel[:, 1] / np.where(ok, z, 1) / m.tan(m.radians(cam.vFov) / 2)
            px = ((sx + 1) / 2 * (w - 1)).astype(int)
            py = ((1 - (sy + 1) / 2) * (h - 1)).astype(int)
            edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6),
                     (5, 7), (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
            for a, b in edges:
                if not (ok[a] and ok[b]):
                    continue
                n = 32
                xs = np.linspace(px[a], px[b], n).astype(int)
                ys = np.linspace(py[a], py[b], n).astype(int)
                m_ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
                img[ys[m_ok], xs[m_ok]] = color
        return img

    def key_press(self, key: str) -> None:
        """BVH descent keys (pathtracer.cpp keyboard handling):
        '<' left child, '>' right child, 'up' parent."""
        node = self.selection_history[-1]
        if key in ("<", "left") and node.l is not None:
            self.selection_history.append(node.l)
        elif key in (">", "right") and node.r is not None:
            self.selection_history.append(node.r)
        elif key in ("up", "u") and len(self.selection_history) > 1:
            self.selection_history.pop()

    # -- rendering (start_raytracing, pathtracer.cpp:183-213) ------------
    def start_raytracing(self) -> None:
        assert self.scene is not None and self.camera is not None
        self.state = State.RENDERING
        self._stop.clear()
        self.work_queue.clear()
        self.sample_buffer[:] = 0
        tiles = []
        for ty in range(0, self.h, self.TILE):
            for tx in range(0, self.w, self.TILE):
                tiles.append(WorkItem(tx, ty, min(self.TILE, self.w - tx),
                                      min(self.TILE, self.h - ty)))
        self._tiles_total = len(tiles)
        self._tiles_done = 0
        for t in tiles:
            self.work_queue.put_work(t)
        self.workers = [
            threading.Thread(target=self._worker_thread, args=(i,), daemon=True)
            for i in range(self.num_threads)
        ]
        for worker in self.workers:
            worker.start()

    def stop(self) -> None:
        self._stop.set()
        self.work_queue.clear()
        for worker in self.workers:
            worker.join(timeout=5)
        self.workers = []
        self.state = State.READY

    def is_done(self) -> bool:
        if self.state != State.RENDERING:
            return self.state == State.DONE
        with self._lock:
            done = self._tiles_done >= self._tiles_total
        if done:
            self.state = State.DONE
        return done

    def _worker_thread(self, tid: int) -> None:
        """worker_thread loop (pathtracer.cpp:537-558)."""
        rng = np.random.default_rng(15618 + tid)
        while not self._stop.is_set():
            item = self.work_queue.get_work()
            if item is None:
                return
            self.raytrace_tile(item, rng)
            with self._lock:
                self._tiles_done += 1

    # -- integrator -------------------------------------------------------
    def raytrace_tile(self, item: WorkItem, rng) -> None:
        """raytrace_tile (pathtracer.cpp:510-535), vectorized over the
        tile's pixel-samples."""
        tw, th = item.tile_w, item.tile_h
        n = tw * th * self.ns_aa
        pix = np.arange(tw * th)
        px = item.tile_x + (pix % tw)
        py = item.tile_y + (pix // tw)
        px = np.repeat(px, self.ns_aa)
        py = np.repeat(py, self.ns_aa)
        u = rng.random((n, 2))
        x = (px + u[:, 0]) / self.w
        y = (py + u[:, 1]) / self.h
        o, d = self.camera.generate_rays(x, 1.0 - y)
        radiance = self._trace(o, d, rng)
        per_pix = radiance.reshape(tw * th, self.ns_aa, 3)
        acc = per_pix.mean(axis=1)
        se2 = per_pix.var(axis=1, ddof=1) / self.ns_aa
        self.sample_buffer[
            item.tile_y : item.tile_y + th, item.tile_x : item.tile_x + tw
        ] = acc.reshape(th, tw, 3)
        self.se2_buffer[
            item.tile_y : item.tile_y + th, item.tile_x : item.tile_x + tw
        ] = se2.reshape(th, tw, 3)

    def raytrace_pixel(self, x: int, y: int, rng=None) -> np.ndarray:
        """raytrace_pixel (stub at pathtracer.cpp:499-508; implemented):
        estimate one pixel with ns_aa samples."""
        rng = rng or np.random.default_rng(15618)
        u = rng.random((self.ns_aa, 2))
        xs = (x + u[:, 0]) / self.w
        ys = 1.0 - (y + u[:, 1]) / self.h
        o, d = self.camera.generate_rays(xs, ys)
        return self._trace(o, d, rng).mean(axis=0)

    def _closest_hit(self, o, d):
        """Brute-force closest hit over all primitives (numpy)."""
        f = self._flat
        n = len(o)
        best_t = np.full(n, np.inf)
        best_p = np.full(n, -1, np.int64)
        P = len(f["v0"])
        chunk = max(1, 2_000_000 // max(n, 1))
        for s in range(0, P, chunk):
            e = min(s + chunk, P)
            v0 = f["v0"][s:e]
            v1 = f["v1"][s:e]
            v2 = f["v2"][s:e]
            is_sph = f["prim_type"][s:e] == PRIM_SPHERE
            # triangles
            nrm = np.cross(v1 - v0, v2 - v0)
            denom = d @ nrm.T  # [n, m]
            with np.errstate(divide="ignore", invalid="ignore"):
                t_tri = ((nrm * v0).sum(1)[None, :] - (o @ nrm.T)) / denom
                p = o[:, None, :] + t_tri[..., None] * d[:, None, :]
                in0 = np.einsum("nmk,mk->nm", np.cross(v1 - v0, p - v0), nrm) >= 0
                in1 = np.einsum("nmk,mk->nm", np.cross(v2 - v1, p - v1), nrm) >= 0
                in2 = np.einsum("nmk,mk->nm", np.cross(v0 - v2, p - v2), nrm) >= 0
                ok_tri = (np.abs(denom) > 1e-12) & in0 & in1 & in2 & (t_tri >= 0)
                # spheres
                oc = o[:, None, :] - v0[None, :, :]
                b = 2 * np.einsum("nmk,nk->nm", oc, d)
                c = (oc * oc).sum(-1) - (v1[:, 0] ** 2)[None, :]
                disc = b * b - 4 * c
                sq = np.sqrt(np.maximum(disc, 0))
                t1 = (-b - sq) / 2
                t2 = (-b + sq) / 2
                t_sph = np.where(t1 > 0, t1, t2)
                ok_sph = (disc >= 0) & (t_sph > 0)
            t = np.where(is_sph[None, :], t_sph, t_tri)
            ok = np.where(is_sph[None, :], ok_sph, ok_tri)
            t = np.where(ok, t, np.inf)
            k = t.argmin(axis=1)
            tk = t[np.arange(n), k]
            better = tk < best_t
            best_t = np.where(better, tk, best_t)
            best_p = np.where(better, k + s, best_p)
        return best_t, best_p

    def _occluded(self, o, d, max_t):
        t, p = self._closest_hit(o, d)
        return (p >= 0) & (t < max_t - 1e-3)

    def _trace(self, o, d, rng) -> np.ndarray:
        """trace_ray over a ray batch (the integrator the reference left
        as a stub, pathtracer.cpp:395-497): emission on counted hits,
        NEE at diffuse vertices, uniform-hemisphere / specular bounces."""
        f = self._flat
        n = len(o)
        light = np.zeros((n, 3))
        importance = np.ones((n, 3))
        alive = np.ones(n, bool)
        count_emission = np.ones(n, bool)
        env = next(
            (l for l in self.scene.lights
             if isinstance(l, st.EnvironmentLight)), None
        )
        for depth in range(self.max_ray_depth):
            t, p = self._closest_hit(o, d)
            hit = (p >= 0) & alive
            if env is not None:
                # escaped counted paths pick up the environment
                miss = alive & (p < 0) & count_emission
                for i in np.where(miss)[0]:
                    light[i] += importance[i] * env.sample_dir(d[i])
            if not hit.any():
                break
            pidx = np.where(hit, p, 0)
            t_safe = np.where(hit, t, 0.0)
            pt = o + t_safe[:, None] * d
            is_sph = f["prim_type"][pidx] == PRIM_SPHERE
            # normals
            v0, v1, v2 = f["v0"][pidx], f["v1"][pidx], f["v2"][pidx]
            nrm_t = np.cross(v1 - v0, v2 - v0)
            tot = np.linalg.norm(nrm_t, axis=1, keepdims=True) + 1e-20
            bC = np.linalg.norm(np.cross(v0 - pt, v1 - pt), axis=1) / tot[:, 0]
            bA = np.linalg.norm(np.cross(v1 - pt, v2 - pt), axis=1) / tot[:, 0]
            bB = np.linalg.norm(np.cross(v2 - pt, v0 - pt), axis=1) / tot[:, 0]
            nsm = (bA[:, None] * f["n0"][pidx] + bB[:, None] * f["n1"][pidx]
                   + bC[:, None] * f["n2"][pidx])
            n_sph = pt - v0
            nrm = np.where(is_sph[:, None], n_sph, nsm)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-20
            flip = (nrm * d).sum(1) > 0
            nrm = np.where(flip[:, None], -nrm, nrm)

            bidx = f["prim_bsdf"][pidx]
            fn = f["bsdf_fn"][bidx]
            albedo = f["bsdf_albedo"][bidx]
            emission = f["bsdf_radiance"][bidx]
            ior = f["bsdf_ior"][bidx]

            emit_mask = hit & count_emission & (fn == BSDF_EMISSION)
            light[emit_mask] += importance[emit_mask] * emission[emit_mask]

            # NEE at diffuse vertices
            diffuse = hit & (fn == BSDF_DIFFUSE)
            if diffuse.any():
                for sl in self.scene.lights:
                    for _ in range(self.ns_area_light):
                        rad = np.zeros((n, 3))
                        wi = np.zeros((n, 3))
                        dist = np.full(n, np.inf)
                        pdf = np.ones(n)
                        idxs = np.where(diffuse)[0]
                        for i in idxs:
                            r, w_i, dl, pf = sl.sample_L(pt[i], rng)
                            rad[i], wi[i], dist[i], pdf[i] = r, w_i, dl, pf
                        cos_s = np.abs((nrm * wi).sum(1))
                        contrib = (importance * albedo / np.pi
                                   * (cos_s / np.maximum(pdf, 1e-12))[:, None]
                                   * rad / self.ns_area_light)
                        active = diffuse & (rad.sum(1) > 0) & (cos_s > 1e-4)
                        if active.any():
                            occ = np.ones(n, bool)
                            # the shadow origin is offset 1e-3 along the
                            # normal, so the light-point distance from
                            # that origin shrinks by ~cos*1e-3; measure
                            # maxT from the offset origin or the
                            # pass/occlude threshold sits knife-edge on
                            # hits against the light quad itself
                            cos_off = (nrm * wi).sum(1)
                            occ[active] = self._occluded(
                                pt[active] + nrm[active] * 1e-3,
                                wi[active],
                                dist[active] - cos_off[active] * 1e-3,
                            )
                            add = active & (~occ)
                            light[add] += contrib[add]

            if depth + 1 >= self.max_ray_depth:
                break

            # scatter
            u1 = rng.random(n)
            u2 = rng.random(n)
            cos_t = np.abs(2 * u1 - 1)
            sin_t = np.sqrt(np.maximum(0, 1 - cos_t**2))
            phi = 2 * np.pi * u2
            guide = np.where(
                ((nrm[:, 1] < 1e-4) & (nrm[:, 1] > -0.999))[:, None],
                np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
            dpdu = np.cross(guide, nrm)
            dpdu /= np.linalg.norm(dpdu, axis=1, keepdims=True) + 1e-20
            dpdv = np.cross(dpdu, nrm)
            d_dif = (sin_t * np.cos(phi))[:, None] * dpdu \
                + (sin_t * np.sin(phi))[:, None] * dpdv + cos_t[:, None] * nrm
            thr_dif = albedo * (2 * np.abs((d_dif * nrm).sum(1)))[:, None]

            wo = -d
            d_mir = wo - 2 * ((wo * nrm).sum(1))[:, None] * nrm
            d_mir = -d_mir
            thr_mir = albedo

            # refraction/glass (entering if not flipped)
            eta = np.where(flip, ior, 1.0 / np.maximum(ior, 1e-6))
            cos_o = np.clip((wo * nrm).sum(1), 1e-6, 1.0)
            sin2 = eta**2 * np.maximum(0.0, 1 - cos_o**2)
            tir = sin2 >= 1.0
            cos_tr = np.sqrt(np.maximum(0.0, 1 - sin2))
            d_ref = (-eta[:, None] * (wo - cos_o[:, None] * nrm)
                     - cos_tr[:, None] * nrm)
            r0 = ((1 - ior) / (1 + ior)) ** 2
            fres = r0 + (1 - r0) * (1 - cos_o) ** 5
            fres = np.where(tir, 1.0, fres)
            pick_r = rng.random(n) < fres
            d_glass = np.where((pick_r | tir)[:, None], d_mir, d_ref)
            thr_glass = np.where(
                (pick_r | tir)[:, None], f["bsdf_radiance"][bidx],
                albedo * (eta**2)[:, None])
            d_refr = np.where(tir[:, None], d_mir, d_ref)
            thr_refr = np.where(tir[:, None], albedo, albedo * (eta**2)[:, None])

            d_new = np.where((fn == BSDF_DIFFUSE)[:, None], d_dif,
                     np.where((fn == BSDF_MIRROR)[:, None], d_mir,
                      np.where((fn == BSDF_REFRACTION)[:, None], d_refr,
                               d_glass)))
            thr = np.where((fn == BSDF_DIFFUSE)[:, None], thr_dif,
                   np.where((fn == BSDF_MIRROR)[:, None], thr_mir,
                    np.where((fn == BSDF_REFRACTION)[:, None], thr_refr,
                             thr_glass)))
            is_delta = (fn == BSDF_MIRROR) | (fn == BSDF_REFRACTION) | (fn == BSDF_GLASS)
            transmit = ((fn == BSDF_REFRACTION) | ((fn == BSDF_GLASS) & ~pick_r)) & ~tir
            offs = np.where(transmit[:, None], -1e-3 * nrm, 1e-3 * nrm)
            o = pt + offs
            dnl = np.linalg.norm(d_new, axis=1, keepdims=True) + 1e-20
            d = d_new / dnl
            importance = importance * thr
            alive = hit & (fn != BSDF_EMISSION) & (importance.max(1) > 1e-6)
            count_emission = is_delta
            if not alive.any():
                break
        return light

    # -- output (save_image, pathtracer.cpp:577-591) ----------------------
    def save_image(self, filename: str, tonemapped: bool = True) -> None:
        from ..utils.image import save_png

        img = self.sample_buffer
        if tonemapped:
            img = (np.clip(img, 0, None) * np.sqrt(2.0)) ** (1.0 / 2.2)
        save_png(filename, img)

    def update_screen(self) -> Tuple[int, int]:
        """Progress for a UI poll loop: (tiles done, total)."""
        with self._lock:
            return self._tiles_done, self._tiles_total
