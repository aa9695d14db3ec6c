"""Native data-loader pipelines: C++ batch assembly over the loader core.

The TPU-native equivalent of the reference's torch DataLoader machinery
(C++ under the Python API; SURVEY.md §3.1 names the dataloader-worker mosaic
pipeline as the host hot loop). Python's per-sample role shrinks to drawing
the random parameters (identical rng consumption to augment.TrainPipeline —
same (seed, epoch, index) → same content) and transforming the tiny box
arrays via the shared helpers in augment.py; every pixel pass (optional
JPEG decode, mosaic/letterbox render, affine warp, HSV jitter, flip) runs
inside ONE ``hd_pool_run`` call on a persistent C++ thread pool
(native/loader_core.cpp). Pixel output is bit-identical to the pure-Python
pipeline — except the affine warp, which may differ by a few intensity
levels when the pip cv2 wheel and the system OpenCV C++ library are
different releases (box coordinates stay exact: shared numpy math). Pinned
by tests/test_native_loader.py.

Decode modes:
  * default — sources come from ``dataset.load`` (cv2 decode, composes with
    readers.CachedDataset for warm-epoch RAM caching);
  * ``decode_in_pool=True`` — raw JPEG bytes are handed to the pool and
    decoded by libjpeg inside C++ (bit-identical to cv2.imdecode; no EXIF
    rotation — route EXIF-oriented files through the default mode).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from heltondetection_tpu.data.readers import drop_ignore_boxes
from heltondetection_tpu.data.augment import (affine_boxes, affine_params,
                                              flip_boxes, hsv_params,
                                              mixup_blend, mixup_draws,
                                              MIXUP_STREAM_TAG,
                                              mosaic_boxes)
from heltondetection_tpu.native import HdPlan, get_loader_lib


def native_loader_available() -> bool:
    return get_loader_lib() is not None


class NativePool:
    """Persistent C++ worker pool; one per loader. ``run`` is serialized
    with a lock — hd_pool_run is not reentrant."""

    def __init__(self, num_threads: Optional[int] = None):
        self._lib = get_loader_lib()
        if self._lib is None:
            raise RuntimeError("native loader core unavailable")
        n = num_threads or min(32, (os.cpu_count() or 1) * 2)
        self._handle = self._lib.hd_pool_create(int(n))
        self._run_lock = threading.Lock()

    def run(self, plans: "ctypes.Array[HdPlan]", n: int) -> None:
        with self._run_lock:
            self._lib.hd_pool_run(self._handle, plans, n)

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.hd_pool_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover — interpreter-exit ordering
        try:
            self.close()
        except Exception:
            pass


def _ptr(a: np.ndarray) -> int:
    return a.ctypes.data


class _NativePipelineBase:
    """Shared plumbing for the native pipelines: loader-lib handle,
    decode-mode resolution, cache-aware raw-sample fetch, and a PERSISTENT
    prefetch executor (a fresh ThreadPoolExecutor per batch would churn
    ~16 OS threads on the loader hot path)."""

    def _init_native(self, dataset, decode_in_pool: bool) -> None:
        self.ds = dataset
        self.decode_in_pool = (decode_in_pool
                               and hasattr(dataset, "load_encoded"))
        self._lib = get_loader_lib()
        if self._lib is None:
            raise RuntimeError("native loader core unavailable")
        self._fetch_pool = None

    def __len__(self):
        return len(self.ds)

    def _fetch(self, idx: int,
               cache: Optional[Dict[int, Dict]] = None) -> Dict:
        """Raw sample: decoded image (default) or JPEG bytes + dims.
        ``cache`` is a best-effort prefetch dict — misses fall through to a
        direct load."""
        if cache is not None and idx in cache:
            return cache[idx]
        if self.decode_in_pool:
            return self.ds.load_encoded(idx)
        return self.ds.load(idx)

    def _prefetch(self, ids) -> Dict[int, Dict]:
        """Fetch raw samples concurrently (cv2 decode releases the GIL) so
        the serial plan-building phase only touches RAM. Purely an
        optimization: plan() treats the result as a fallback cache."""
        ids = list(ids)
        if len(ids) <= 1:
            return {j: self._fetch(j) for j in ids}
        if self._fetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._fetch_pool = ThreadPoolExecutor(
                16, thread_name_prefix="hd-fetch")
        return dict(zip(ids, self._fetch_pool.map(self._fetch, ids)))

    def close(self) -> None:
        if getattr(self, "_fetch_pool", None) is not None:
            self._fetch_pool.shutdown(wait=False)
            self._fetch_pool = None

    def __del__(self):  # pragma: no cover — interpreter-exit ordering
        try:
            self.close()
        except Exception:
            pass



_PLAN_ERRORS = {
    1: "JPEG decode failed",
    2: "no pixel source (neither decoded image nor JPEG bytes)",
    3: "native exception (e.g. degenerate image dims in cv::resize)",
    4: "decoded JPEG dims disagree with annotation metadata (mis-annotated "
       "or EXIF-rotated file; use the cv2 decode path for EXIF sources)",
}


def _check_status(status: int, idx) -> None:
    if status != 0:
        reason = _PLAN_ERRORS.get(status, "unknown error")
        raise RuntimeError(f"native loader plan failed for index {idx}: "
                           f"{reason} (status {status})")


def _dims(raw: Dict) -> Tuple[int, int]:
    if "image" in raw:
        return raw["image"].shape[:2]
    return raw["height"], raw["width"]


def _set_src(p: HdPlan, t: int, raw: Dict, keep: List) -> None:
    """Point plan tile ``t`` at a decoded RGB buffer or raw JPEG bytes."""
    if "image" in raw:
        img = np.ascontiguousarray(raw["image"])
        keep.append(img)
        p.src[t] = _ptr(img)
        p.sh[t], p.sw[t] = img.shape[:2]
    else:  # encoded: decode in pool
        buf = raw["jpeg"]
        keep.append(buf)
        p.jpeg[t] = _ptr(buf)
        p.jlen[t] = buf.nbytes
        p.sh[t], p.sw[t] = raw["height"], raw["width"]


class NativeTrainPipeline(_NativePipelineBase):
    """Drop-in for augment.TrainPipeline with C++ pixel execution.

    ``plan(idx, epoch, out)`` draws the sample's random parameters, computes
    its gt arrays (shared box helpers), and returns the HdPlan rendering the
    pixels into ``out`` — batch loaders collect plans and run them in one
    pool call; ``sample`` keeps the per-sample API for the generic loaders.
    """

    def __init__(self, dataset, img_size: int, *, mosaic_p: float = 0.5,
                 hsv: bool = True, flip_p: float = 0.5, max_boxes: int = 128,
                 seed: int = 0, affine: bool = True,
                 affine_scale: float = 0.5, affine_translate: float = 0.1,
                 degrees: float = 0.0, mixup_p: float = 0.0,
                 decode_in_pool: bool = False):
        self.img_size = img_size
        self.mosaic_p = mosaic_p
        self.hsv = hsv
        self.flip_p = flip_p
        self.max_boxes = max_boxes
        self.seed = seed
        self.affine = affine
        self.affine_scale = affine_scale
        self.affine_translate = affine_translate
        self.degrees = degrees
        self.mixup_p = mixup_p
        self._init_native(dataset, decode_in_pool)

    def _tile_ids(self, idx: int, rng: np.random.Generator) -> List[int]:
        """Replays _plan_one's draw prefix (mosaic coin + 3 tile picks)."""
        if rng.uniform() < self.mosaic_p and len(self.ds) >= 4:
            return [idx] + [int(j) for j in rng.integers(0, len(self.ds), 3)]
        return [idx]

    def sample_ids(self, idx: int, epoch: int) -> List[int]:
        """Dataset indices ``plan(idx, epoch)`` will fetch — replays only
        the draw PREFIX of plan() (mixup draws, then the mosaic coin + 3
        tile picks, then the mixup partner's own prefix), letting
        sample_batch prefetch sources in parallel. Must stay in lockstep
        with plan()'s first draws."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        partner, _ = mixup_draws(rng, self.mixup_p, len(self.ds))
        ids = self._tile_ids(idx, rng)
        if partner is not None:
            rng2 = np.random.default_rng(np.random.SeedSequence(
                [self.seed, epoch, partner, MIXUP_STREAM_TAG]))
            ids += self._tile_ids(partner, rng2)
        return ids

    def plan(self, idx: int, epoch: int, out: np.ndarray,
             cache: Optional[Dict[int, Dict]] = None
             ) -> Tuple[List[HdPlan], Dict[str, Any], List, float]:
        """Returns (plans, targets, keepalive, blend_r). ``out`` is the
        (S,S,3) uint8 slot the C++ side renders into; ``targets`` are the
        fixed-shape gt arrays; ``keepalive`` holds the buffers the plans
        point at. With mixup active a SECOND plan renders the partner into
        a scratch buffer (keepalive[-1]); the caller blends
        ``out = mixup_blend(out, scratch, blend_r)`` after the pool runs —
        identical pixels to TrainPipeline doing the same numpy blend."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        partner, blend_r = mixup_draws(rng, self.mixup_p, len(self.ds))
        p, boxes, classes, keep = self._plan_one(idx, rng, out, cache)
        plans = [p]
        if partner is not None:
            scratch = np.empty_like(out)
            rng2 = np.random.default_rng(np.random.SeedSequence(
                [self.seed, epoch, partner, MIXUP_STREAM_TAG]))
            p2, boxes2, classes2, keep2 = self._plan_one(
                partner, rng2, scratch, cache)
            plans.append(p2)
            keep += keep2 + [scratch]
            boxes = np.concatenate(
                [boxes.reshape(-1, 4), boxes2.reshape(-1, 4)], axis=0)
            classes = np.concatenate(
                [np.asarray(classes).reshape(-1),
                 np.asarray(classes2).reshape(-1)], axis=0)
        else:
            blend_r = 1.0

        m = self.max_boxes
        gt = np.zeros((m, 4), np.float32)
        cl = np.zeros((m,), np.int32)
        mask = np.zeros((m,), bool)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        classes = np.asarray(classes).reshape(-1)
        n = min(len(classes), m)
        if n:
            b = boxes[:n]
            gt[:n, 0] = (b[:, 0] + b[:, 2]) / 2
            gt[:n, 1] = (b[:, 1] + b[:, 3]) / 2
            gt[:n, 2] = b[:, 2] - b[:, 0]
            gt[:n, 3] = b[:, 3] - b[:, 1]
            cl[:n] = classes[:n]
            mask[:n] = True
        targets = {"gt_boxes": gt, "gt_cls": cl, "gt_mask": mask}
        return plans, targets, keep, blend_r

    def _plan_one(self, idx: int, rng: np.random.Generator, out: np.ndarray,
                  cache: Optional[Dict[int, Dict]] = None
                  ) -> Tuple[HdPlan, np.ndarray, np.ndarray, List]:
        """One sample's render plan, drawing from ``rng`` in the same order
        as TrainPipeline._augment_one. Returns (plan, boxes, classes,
        keepalive)."""
        s = self.img_size
        p = HdPlan()
        p.S = s
        p.pad_value = 114
        p.out = _ptr(out)
        keep: List = [out]

        use_mosaic = rng.uniform() < self.mosaic_p and len(self.ds) >= 4
        if use_mosaic:
            others = rng.integers(0, len(self.ds), 3)
            raws = [drop_ignore_boxes(self._fetch(idx, cache))] + [
                drop_ignore_boxes(self._fetch(int(j), cache))
                for j in others]
            p.mode = 1
            p.n_tiles = 4
            # mosaic4's draws, same order
            p.yc = int(rng.uniform(0.5 * s, 1.5 * s))
            p.xc = int(rng.uniform(0.5 * s, 1.5 * s))
            for t, raw in enumerate(raws):
                _set_src(p, t, raw, keep)
            boxes, classes = mosaic_boxes(raws, s, p.xc, p.yc)
            if self.affine:
                rot, sc = affine_params(
                    rng, s, s, degrees=self.degrees,
                    translate=self.affine_translate, scale=self.affine_scale)
                p.do_affine = 1
                rot64 = np.ascontiguousarray(rot, np.float64)
                ctypes.memmove(p.m, rot64.ctypes.data, 6 * 8)
                boxes, classes = affine_boxes(boxes, classes, rot, sc, s, s)
        else:
            raw = drop_ignore_boxes(self._fetch(idx, cache))
            p.mode = 0
            p.n_tiles = 1
            _set_src(p, 0, raw, keep)
            h, w = _dims(raw)
            scale = min(s / h, s / w)
            nw, nh = int(round(w * scale)), int(round(h * scale))
            left, top = (s - nw) // 2, (s - nh) // 2
            boxes = raw["boxes"]
            if len(boxes):
                boxes = boxes * scale + np.array([left, top, left, top],
                                                 np.float32)
            boxes = boxes.astype(np.float32)
            classes = raw["classes"]
        if self.hsv:
            r = hsv_params(rng)
            p.do_hsv = 1
            p.r0, p.r1, p.r2 = float(r[0]), float(r[1]), float(r[2])
        if rng.uniform() < self.flip_p:
            p.do_flip = 1
            boxes = flip_boxes(boxes, s)
        return p, np.asarray(boxes, np.float32).reshape(-1, 4), \
            np.asarray(classes).reshape(-1), keep

    def sample(self, idx: int, epoch: int = 0) -> Dict:
        """Single-sample fallback (generic TrainLoader compatibility)."""
        out = np.empty((self.img_size, self.img_size, 3), np.uint8)
        plans, targets, keep, blend_r = self.plan(idx, epoch, out)
        for p in plans:
            self._lib.hd_run_plan(ctypes.byref(p))
            _check_status(p.status, idx)
        if len(plans) == 2:
            out[...] = mixup_blend(out, keep[-1], blend_r)
        return {"image": out, **targets}

    def sample_batch(self, idxs: Sequence[int], epoch: int,
                     pool: NativePool) -> Dict[str, np.ndarray]:
        """Assemble a whole batch with one C++ pool call (mixup partners
        ride the same call as extra plans; their blends run host-side after
        the pool returns)."""
        bsz = len(idxs)
        s = self.img_size
        images = np.empty((bsz, s, s, 3), np.uint8)
        plan_list: List[HdPlan] = []
        blends: List[Tuple[int, np.ndarray, float]] = []
        keeps: List = []
        tgt: List[Dict] = []
        cache = self._prefetch({j for idx in idxs
                                for j in self.sample_ids(int(idx), epoch)})
        owners: List[int] = []
        for i, idx in enumerate(idxs):
            ps, targets, keep, blend_r = self.plan(int(idx), epoch,
                                                   images[i], cache)
            plan_list.extend(ps)
            owners.extend([int(idx)] * len(ps))
            if len(ps) == 2:
                blends.append((i, keep[-1], blend_r))
            keeps.append(keep)
            tgt.append(targets)
        plans = (HdPlan * len(plan_list))(*plan_list)
        pool.run(plans, len(plan_list))
        for p, owner in zip(plans, owners):
            _check_status(p.status, owner)
        for i, scratch, blend_r in blends:
            images[i] = mixup_blend(images[i], scratch, blend_r)
        return {
            "image": images,
            "gt_boxes": np.stack([t["gt_boxes"] for t in tgt]),
            "gt_cls": np.stack([t["gt_cls"] for t in tgt]),
            "gt_mask": np.stack([t["gt_mask"] for t in tgt]),
        }


class NativeEvalPipeline(_NativePipelineBase):
    """Letterbox-only eval preprocessing through the C++ core (drop-in for
    augment.EvalPipeline, plus ``sample_batch``)."""

    def __init__(self, dataset, img_size: int, *,
                 decode_in_pool: bool = False):
        self.img_size = img_size
        self._init_native(dataset, decode_in_pool)

    def plan(self, idx: int, out: np.ndarray,
             cache: Optional[Dict[int, Dict]] = None):
        raw = self._fetch(idx, cache)
        p = HdPlan()
        p.mode = 0
        p.n_tiles = 1
        p.S = self.img_size
        p.pad_value = 114
        p.out = _ptr(out)
        keep: List = [out]
        if "image" in raw:
            img = np.ascontiguousarray(raw["image"])
            keep.append(img)
            p.src[0] = _ptr(img)
            h, w = img.shape[:2]
            p.sh[0], p.sw[0] = h, w
        else:
            buf = raw["jpeg"]
            keep.append(buf)
            p.jpeg[0] = _ptr(buf)
            p.jlen[0] = buf.nbytes
            h, w = raw["height"], raw["width"]
            p.sh[0], p.sw[0] = h, w
        s = self.img_size
        scale = min(s / h, s / w)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        meta = {"img_id": raw["img_id"], "scale": scale,
                "pad_x": float((s - nw) // 2), "pad_y": float((s - nh) // 2),
                "orig_hw": (h, w)}
        return p, meta, keep

    def sample(self, idx: int) -> Dict:
        out = np.empty((self.img_size, self.img_size, 3), np.uint8)
        p, meta, keep = self.plan(idx, out)
        self._lib.hd_run_plan(ctypes.byref(p))
        _check_status(p.status, idx)
        return {"image": out, **meta}

    def sample_batch(self, idxs: Sequence[int], pool: NativePool
                     ) -> List[Dict]:
        bsz = len(idxs)
        s = self.img_size
        images = np.empty((bsz, s, s, 3), np.uint8)
        plans = (HdPlan * bsz)()
        keeps: List = []
        metas: List[Dict] = []
        cache = self._prefetch({int(i) for i in idxs})
        for i, idx in enumerate(idxs):
            p, meta, keep = self.plan(int(idx), images[i], cache)
            plans[i] = p
            keeps.append(keep)
            metas.append(meta)
        pool.run(plans, bsz)
        for i in range(bsz):
            _check_status(plans[i].status, idxs[i])
        return [{"image": images[i], **metas[i]} for i in range(bsz)]


class NativeDeviceAugPipeline(_NativePipelineBase):
    """Host half of the on-device augmentation path through the C++ core
    (drop-in for augment.DeviceAugPipeline): per sample, letterbox up to 4
    tiles (self + 3 seeded-random others when the host-side mosaic coin
    fires) into a (4,S,S,3) uint8 stack; all other randomness (crop offset,
    flip, color jitter) happens on device (data/device_aug.py). Same rng
    consumption as the Python version → identical batches."""

    KEYS = ("images4", "boxes4", "cls4", "mask4", "mosaic4")

    def __init__(self, dataset, img_size: int, *, max_boxes: int = 32,
                 seed: int = 0, mosaic_p: float = 1.0,
                 decode_in_pool: bool = False):
        self.img_size = img_size
        self.max_boxes = max_boxes
        self.seed = seed
        self.mosaic_p = mosaic_p
        self._init_native(dataset, decode_in_pool)

    def sample_ids(self, idx: int, epoch: int) -> List[int]:
        """Draw-prefix replay of plan() for parallel prefetch (see
        NativeTrainPipeline.sample_ids)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        if rng.uniform() < self.mosaic_p:
            return [idx] + [int(j) for j in rng.integers(0, len(self.ds), 3)]
        return [idx]

    def plan(self, idx: int, epoch: int, out4: np.ndarray,
             cache: Optional[Dict[int, Dict]] = None):
        """``out4``: (4,S,S,3) uint8, prefilled with 114 (unused tiles keep
        the fill). Returns (plans, targets, keepalive)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx]))
        s = self.img_size
        m = self.max_boxes
        use_mosaic = bool(rng.uniform() < self.mosaic_p)
        if use_mosaic:
            ids = [idx] + [int(j) for j in rng.integers(0, len(self.ds), 3)]
        else:
            ids = [idx]
        boxes4 = np.zeros((4, m, 4), np.float32)
        cls4 = np.zeros((4, m), np.int32)
        mask4 = np.zeros((4, m), bool)
        plans: List[HdPlan] = []
        keep: List = [out4]
        for t, j in enumerate(ids):
            raw = drop_ignore_boxes(self._fetch(j, cache))
            p = HdPlan()
            p.mode = 0
            p.n_tiles = 1
            p.S = s
            p.pad_value = 114
            p.out = _ptr(out4[t])
            _set_src(p, 0, raw, keep)
            h, w = _dims(raw)
            scale = min(s / h, s / w)
            nw, nh = int(round(w * scale)), int(round(h * scale))
            left, top = (s - nw) // 2, (s - nh) // 2
            n = min(len(raw["classes"]), m)
            if n:
                b = raw["boxes"][:n] * scale + np.array(
                    [left, top, left, top], np.float32)
                boxes4[t, :n] = b
                cls4[t, :n] = raw["classes"][:n]
                mask4[t, :n] = True
            plans.append(p)
        targets = {"boxes4": boxes4, "cls4": cls4, "mask4": mask4,
                   "mosaic4": np.asarray(use_mosaic)}
        return plans, targets, keep

    def sample(self, idx: int, epoch: int = 0) -> Dict:
        out4 = np.full((4, self.img_size, self.img_size, 3), 114, np.uint8)
        plans, targets, keep = self.plan(idx, epoch, out4)
        for p in plans:
            self._lib.hd_run_plan(ctypes.byref(p))
            _check_status(p.status, idx)
        return {"images4": out4, **targets}

    def sample_batch(self, idxs: Sequence[int], epoch: int,
                     pool: NativePool) -> Dict[str, np.ndarray]:
        bsz = len(idxs)
        s = self.img_size
        images = np.full((bsz, 4, s, s, 3), 114, np.uint8)
        all_plans: List[HdPlan] = []
        plan_owner: List[int] = []   # flat plan index -> sample index
        keeps: List = []
        tgt: List[Dict] = []
        cache = self._prefetch({j for idx in idxs
                                for j in self.sample_ids(int(idx), epoch)})
        for i, idx in enumerate(idxs):
            plans, targets, keep = self.plan(int(idx), epoch, images[i],
                                             cache)
            all_plans.extend(plans)
            plan_owner.extend([int(idx)] * len(plans))
            keeps.append(keep)
            tgt.append(targets)
        arr = (HdPlan * len(all_plans))(*all_plans)
        pool.run(arr, len(all_plans))
        for i in range(len(all_plans)):
            _check_status(arr[i].status, plan_owner[i])
        return {
            "images4": images,
            "boxes4": np.stack([t["boxes4"] for t in tgt]),
            "cls4": np.stack([t["cls4"] for t in tgt]),
            "mask4": np.stack([t["mask4"] for t in tgt]),
            "mosaic4": np.stack([t["mosaic4"] for t in tgt]),
        }
