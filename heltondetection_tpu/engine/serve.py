"""Serving layer: dynamic request batching onto the static-shape TPU step.

Production framing of the inference stack (SURVEY.md §3.3 is the per-call
path; this module is the request-level front end the reference leaves to
its users). TPU programs are compiled once for a STATIC batch shape —
serving traffic arrives one frame at a time. :class:`BatchingDetector`
bridges the two the TPU-idiomatic way:

* client threads submit single frames (``submit`` → future, ``detect`` →
  blocking) and letterbox on THEIR thread, so host preprocessing scales
  with client concurrency;
* one dispatcher thread groups requests into fixed ``batch_size`` batches
  (padding the tail by repetition — one compiled program, no retraces),
  dispatches asynchronously, and keeps up to ``max_in_flight`` batches in
  flight — dispatch k+1 before fetching k, the same pipelining the
  evaluator uses to overlap host work with device compute;
* results come back per request in source-image coordinates, the same
  contract as ``Detector.detect_image`` (within the compiled batch size,
  batch COMPOSITION cannot change a frame's results — the whole
  model+postprocess is per-image; across different batch sizes XLA
  programs differ in reduction order by final float bits, as anywhere).

``serve_http`` is a dependency-free (stdlib ``http.server``) front end:
POST an encoded image to ``/detect``, get JSON detections back;
``GET /healthz`` reports liveness + batching stats.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from heltondetection_tpu.engine.infer import Detector


class BatchingDetector:
    """Dynamic batcher over a :class:`Detector`'s compiled serve step.

    Args:
      detector: a non-TTA Detector (TTA multiplies dispatches per frame —
        wrong trade for throughput serving; raise rather than silently
        serve at 1/3 speed).
      batch_size: the static device batch. Bigger amortizes dispatch
        overhead (b128 is the measured v5e throughput sweet spot for
        YOLOv5s; use 8-16 when p99 latency matters more than img/s).
      max_wait_ms: how long the dispatcher waits to fill a batch before
        sending it partially full (latency bound under light load).
      max_in_flight: device batches outstanding before the dispatcher
        blocks on the oldest fetch. 2 = classic double buffering.
      mesh: optional ``jax.sharding.Mesh`` — each batch is sharded over
        its 'data' axis so one server feeds every local chip (the same
        multi-chip pattern the evaluator uses); ``batch_size`` must
        divide by the mesh's data-axis size.
      batch_buckets: OPT-IN adaptive batching: extra static batch sizes
        to compile (jax.jit caches one program per shape). A partially-
        filled collection dispatches the SMALLEST bucket that holds it,
        so light load (clients < batch) stops paying for padded slots —
        the measured failure mode was 47% fill at batch=16 with 8
        clients; (4, 16) restores ≥90%. Default: batch_size only, which
        keeps results bit-stable across load (different batch shapes
        compile different XLA programs whose reductions differ in final
        float bits). ``warmup()`` pre-compiles every bucket.
    """

    def __init__(self, detector: Detector, *, batch_size: int = 8,
                 max_wait_ms: float = 5.0, max_in_flight: int = 2,
                 mesh=None, batch_buckets: Optional[Sequence[int]] = None):
        if detector.tta:
            raise ValueError(
                "BatchingDetector serves the single-view path; construct "
                "the Detector with tta=False (TTA triples device work per "
                "frame — opt into it per-request via Detector directly)")
        if batch_size < 1 or max_in_flight < 1:
            raise ValueError("batch_size and max_in_flight must be >= 1")
        self._sharding = None
        if mesh is not None:
            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the mesh's "
                    f"data axis ({mesh.shape['data']})")
            from heltondetection_tpu.parallel.mesh import batch_sharding
            self._sharding = batch_sharding(mesh)
        self._det = detector
        self.batch_size = batch_size
        if batch_buckets is None:
            buckets = {batch_size}
        else:
            buckets = {int(b) for b in batch_buckets} | {batch_size}
            if any(b < 1 or b > batch_size for b in buckets):
                raise ValueError(
                    f"batch_buckets must lie in [1, batch_size]; got "
                    f"{sorted(buckets)}")
        if self._sharding is not None:
            # every compiled shape must shard evenly over the data axis
            n = mesh.shape["data"]
            buckets = {b for b in buckets if b % n == 0}
        self.batch_buckets = sorted(buckets)
        self.max_wait_s = max_wait_ms / 1e3
        self.max_in_flight = max_in_flight
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # orders every submit against close()'s poison put: without it a
        # submitter that passed the _closed check could be descheduled and
        # enqueue AFTER the poison, leaving its future unresolved forever
        self._submit_lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "padded_slots": 0,
                       "dispatched_slots": 0}
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._dispatch_loop,
                                        name="batching-detector",
                                        daemon=True)
        self._worker.start()

    # -- client API ---------------------------------------------------------

    def submit(self, img_rgb: np.ndarray) -> Future:
        """Enqueue one RGB frame; the future resolves to
        ``(boxes_xyxy, scores, classes)`` in source coordinates."""
        from heltondetection_tpu.data.augment import letterbox_np
        # letterbox on the CALLER's thread: host preprocessing then scales
        # with client concurrency instead of serializing in the dispatcher
        lb, _, meta = letterbox_np(img_rgb, np.zeros((0, 4), np.float32),
                                   self._det.img_size)
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchingDetector is closed")
            self._q.put((lb, meta, img_rgb.shape[:2], fut))
        with self._stats_lock:
            self._stats["requests"] += 1
        return fut

    def detect(self, img_rgb: np.ndarray, timeout: Optional[float] = None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Blocking convenience wrapper over :meth:`submit`."""
        return self.submit(img_rgb).result(timeout)

    def stats(self) -> Dict[str, int]:
        with self._stats_lock:
            return dict(self._stats)

    def reset_stats(self) -> None:
        """Zero the batching counters (e.g. after warmup, so fill/padding
        percentages reflect only the measured window)."""
        with self._stats_lock:
            for k in self._stats:
                self._stats[k] = 0

    def warmup(self) -> None:
        """Compile + run every batch bucket once on dummy frames, so
        production traffic never pays a first-shape XLA compile."""
        import jax
        import jax.numpy as jnp
        s = self._det.img_size
        for b in self.batch_buckets:
            x = np.zeros((b, s, s, 3), np.float32)
            if self._sharding is not None:
                x = jax.device_put(x, self._sharding)
            jax.device_get(self._det._detect(jnp.asarray(x)))

    def close(self, timeout: float = 30.0) -> bool:
        """Drain pending requests and stop the dispatcher. Returns True if
        the drain completed within ``timeout``; on False the (daemon)
        dispatcher is still draining — callers keeping the process alive
        will still see their futures resolve, but exiting now abandons
        them."""
        with self._submit_lock:
            if self._closed:
                already = True
            else:
                already = False
                self._closed = True
                self._q.put(None)   # wake + poison (ordered after all submits)
        if already:
            self._worker.join(timeout)
            return not self._worker.is_alive()
        self._worker.join(timeout)
        if self._worker.is_alive():
            from heltondetection_tpu.utils.log import get_logger
            get_logger().warning(
                "BatchingDetector.close: drain still running after %.0fs "
                "(pending requests only resolve while the process lives)",
                timeout)
            return False
        return True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher ---------------------------------------------------------

    def _collect_batch(self):
        """Block for the first request, then fill up to batch_size for at
        most max_wait_s. Returns a list of request tuples, or None on
        shutdown (after requeueing nothing — pending items drain first)."""
        import time
        try:
            first = self._q.get()
        except (EOFError, OSError):    # interpreter teardown
            return None
        if first is None:
            return None
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)      # keep the poison for the outer loop
                break
            items.append(nxt)
        return items

    def _dispatch_loop(self):
        import jax
        import jax.numpy as jnp
        in_flight = []                 # [(device_out, items)]

        def _resolve(out, items):
            # JAX dispatch is async — device-side failures (runtime error,
            # OOM, transfer fault) surface HERE at the fetch, not at the
            # dispatch. A raise must fail this batch's futures, never kill
            # the dispatcher thread (that would wedge every later request).
            try:
                ob, os_, oc, ov = jax.device_get(out)
            except Exception as e:
                for _, _, _, fut in items:
                    if fut.set_running_or_notify_cancel():
                        fut.set_exception(e)
                return
            for i, (_, meta, hw, fut) in enumerate(items):
                if fut.set_running_or_notify_cancel():
                    try:
                        fut.set_result(self._det._to_source(
                            ob[i], os_[i], oc[i], ov[i], meta, hw))
                    except Exception as e:   # pragma: no cover
                        fut.set_exception(e)

        while True:
            items = self._collect_batch()
            if items is None:
                break
            try:
                real = len(items)
                # smallest compiled bucket that holds the collection:
                # light load dispatches the small program instead of
                # padding the big one
                bucket = next(b for b in self.batch_buckets if b >= real)
                lbs = [it[0] for it in items]
                lbs += [lbs[-1]] * (bucket - real)        # static shape
                x = np.stack(lbs).astype(np.float32)
                if self._sharding is not None:   # multi-chip: shard the
                    x = jax.device_put(x, self._sharding)   # data axis
                out = self._det._detect(jnp.asarray(x))    # ASYNC dispatch
                in_flight.append((out, items))
                with self._stats_lock:
                    self._stats["batches"] += 1
                    self._stats["padded_slots"] += bucket - real
                    self._stats["dispatched_slots"] += bucket
            except Exception as e:
                for _, _, _, fut in items:
                    if fut.set_running_or_notify_cancel():
                        fut.set_exception(e)
                # fall through to the drain loop: earlier batches already
                # in flight must still resolve even if no traffic follows
            # fetch the OLDEST batch only once max_in_flight are queued —
            # the device computes batch k while the host letterboxes and
            # stacks batch k+1
            while len(in_flight) >= self.max_in_flight \
                    or (self._q.empty() and in_flight):
                out, its = in_flight.pop(0)
                _resolve(out, its)
        for out, its in in_flight:     # drain on shutdown
            _resolve(out, its)


def make_http_server(batcher: BatchingDetector, *, host: str = "0.0.0.0",
                     port: int = 8000,
                     class_names: Optional[Sequence[str]] = None,
                     request_timeout: float = 120.0):
    """Build (without starting) the stdlib HTTP server over a
    :class:`BatchingDetector`. ``port=0`` binds an ephemeral port
    (``server_address[1]`` reports it — used by tests).

    POST /detect   body = encoded image (JPEG/PNG/…)
                   → {"boxes": [[x1,y1,x2,y2]…], "scores": […],
                      "classes": […], "names": […]?}
    GET  /healthz  → {"ok": true, …batching stats}

    Thread-per-connection (``ThreadingHTTPServer``): N concurrent clients
    become N submitters into the batcher, which is exactly what keeps the
    device batch full.
    """
    import cv2
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **batcher.stats()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image"})
                return
            # bounded wait + JSON error responses: a wedged/failed batch
            # must not pin this handler thread forever or drop the
            # connection without a body
            try:
                boxes, scores, classes = batcher.detect(
                    cv2.cvtColor(img, cv2.COLOR_BGR2RGB),
                    timeout=request_timeout)
            except TimeoutError:
                self._json(503, {"error": f"detection timed out after "
                                          f"{request_timeout:g}s"})
                return
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            out = {"boxes": boxes.round(2).tolist(),
                   "scores": scores.round(4).tolist(),
                   "classes": classes.tolist()}
            if class_names is not None:
                # a name list shorter than the model's class count must not
                # drop the connection bodyless (IndexError past the try)
                out["names"] = [class_names[c] if 0 <= c < len(class_names)
                                else str(int(c)) for c in classes]
            self._json(200, out)

        def log_message(self, *a):     # quiet; the framework logger owns IO
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(batcher: BatchingDetector, *, host: str = "0.0.0.0",
               port: int = 8000,
               class_names: Optional[Sequence[str]] = None):
    """Blocking front end: build the server and run it until interrupted."""
    from heltondetection_tpu.utils.log import get_logger
    srv = make_http_server(batcher, host=host, port=port,
                           class_names=class_names)
    get_logger().info("serving on http://%s:%d (batch %d)",
                      *srv.server_address[:2], batcher.batch_size)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        # Ctrl-C is the documented way to stop `--mode serve` — shut down
        # cleanly instead of letting the interrupt traceback out of main
        get_logger().info("interrupt received, shutting down")
    finally:
        srv.server_close()
