"""Serving layer (engine/serve.py): dynamic batching onto the static-shape
compiled step must be COMPOSITION-TRANSPARENT — whatever batch a request
lands in (full, padded tail, mixed with other clients' frames), its
detections equal a same-batch-size dispatch of that frame alone, because
the whole model+postprocess is per-image. (Across DIFFERENT batch sizes
XLA compiles different programs whose reduction orders differ in the last
float bits — so the pinned invariant is per-composition, per-size.)
Also pins the batching mechanics (grouping, padding stats, drain-on-close)
and the stdlib HTTP front end.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heltondetection_tpu.engine.infer import Detector
from heltondetection_tpu.engine.serve import (BatchingDetector,
                                              make_http_server)
from heltondetection_tpu.models.yolov5 import YOLOv5, decode_full


@pytest.fixture(scope="module")
def tiny_model():
    nc = 4
    model = YOLOv5(num_classes=nc, depth_multiple=0.33, width_multiple=0.125)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables, nc


@pytest.fixture(scope="module")
def tiny_detector(tiny_model):
    model, variables, nc = tiny_model

    def fwd(images):
        outs = model.apply(variables, images / 255.0, train=False)
        return decode_full(outs, nc)

    return Detector(fwd, nc, 64, conf_thres=0.005)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
            for _ in range(n)]


def test_batching_matches_single_image(tiny_detector):
    """Concurrent submitters, odd totals (padded tail), small batch: every
    request's result is bit-identical to a batch-4 dispatch of that frame
    co-batched with copies of itself (composition transparency)."""
    frames = _frames(13, seed=3)
    want = [tiny_detector.detect_batch([f] * 4)[0] for f in frames]

    with BatchingDetector(tiny_detector, batch_size=4,
                          max_wait_ms=30.0) as bd:
        futs = [None] * len(frames)

        def client(lo, hi):
            for i in range(lo, hi):
                futs[i] = bd.submit(frames[i])

        threads = [threading.Thread(target=client, args=(i, min(i + 5, 13)))
                   for i in range(0, 13, 5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = [f.result(timeout=120) for f in futs]
        stats = bd.stats()

    assert stats["requests"] == 13
    # 13 requests in batches of <=4 → at least ceil(13/4) dispatches
    assert stats["batches"] >= 4
    for (b1, s1, c1), (b2, s2, c2) in zip(want, got):
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(c1, c2)


def test_partial_batch_padding_and_latency_bound(tiny_detector):
    """A lone request must not wait for a full batch: the max_wait_ms
    deadline dispatches a padded partial batch (on the SMALLEST bucket
    that holds it — a single compiled shape when buckets are pinned)."""
    with BatchingDetector(tiny_detector, batch_size=8, max_wait_ms=10.0,
                          batch_buckets=(8,)) as bd:
        (b, s, c) = bd.detect(_frames(1, seed=5)[0], timeout=120)
        stats = bd.stats()
    assert stats == {"requests": 1, "batches": 1, "padded_slots": 7,
                     "dispatched_slots": 8}
    assert b.shape[1] == 4 if b.size else True


def test_close_drains_and_rejects(tiny_detector):
    bd = BatchingDetector(tiny_detector, batch_size=4, max_wait_ms=5.0)
    futs = [bd.submit(f) for f in _frames(3, seed=7)]
    bd.close()
    for f in futs:           # pending work resolves on close
        boxes, scores, classes = f.result(timeout=120)
        assert boxes.shape[1] == 4 if boxes.size else True
    with pytest.raises(RuntimeError):
        bd.submit(_frames(1)[0])
    bd.close()               # idempotent


def test_rejects_tta_detector():
    tta_det = Detector.__new__(Detector)   # attribute stub is enough —
    tta_det.tta = True                     # the guard reads only .tta
    with pytest.raises(ValueError, match="tta=False"):
        BatchingDetector(tta_det)


def test_http_server_detect_and_healthz(tiny_detector):
    cv2 = pytest.importorskip("cv2")
    frame = _frames(1, seed=9)[0]
    want_b, want_s, want_c = tiny_detector.detect_image(frame)

    with BatchingDetector(tiny_detector, batch_size=2,
                          max_wait_ms=5.0) as bd:
        srv = make_http_server(bd, host="127.0.0.1", port=0,
                               class_names=["a", "b", "c", "d"])
        port = srv.server_address[1]
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        try:
            ok, buf = cv2.imencode(".png", cv2.cvtColor(frame,
                                                        cv2.COLOR_RGB2BGR))
            assert ok
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=buf.tobytes(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            assert len(out["boxes"]) == len(want_b)
            if len(want_b):
                np.testing.assert_allclose(out["boxes"], want_b, atol=0.01)
                np.testing.assert_allclose(out["scores"], want_s, atol=1e-4)
                assert out["classes"] == want_c.tolist()
                assert out["names"] == [["a", "b", "c", "d"][c]
                                        for c in want_c]

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                hz = json.loads(r.read())
            assert hz["ok"] and hz["requests"] >= 1

            # malformed body → 400, not a crash
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=b"not-an-image",
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400
        finally:
            srv.shutdown()
            srv.server_close()
            th.join(timeout=10)


def test_detector_packed_detect_fn_matches_generic(tiny_model):
    """Detector(detect_fn=packed serve step) — the path load_detector wires
    for yolov5 and serving rides — agrees with the generic
    forward+make_postprocess route on confident clustered detections
    (exact candidate pre-filters differ below threshold; parity at eval
    verdict level is pinned in test_postprocess_fused)."""
    from heltondetection_tpu.engine.evaluator import make_packed_serve_step
    model, variables, nc = tiny_model

    def fwd(images):
        outs = model.apply(variables, images / 255.0, train=False)
        return decode_full(outs, nc)

    det_gen = Detector(fwd, nc, 64, conf_thres=0.2)
    step = make_packed_serve_step(model, variables, nc, conf_thres=0.2,
                                  iou_thres=0.45, multi_label=False)
    det_pkd = Detector(None, nc, 64, conf_thres=0.2, detect_fn=step)

    for seed in range(3):
        img = _frames(1, seed=seed)[0]
        bg, sg, cg = det_gen.detect_image(img)
        bp, sp, cp = det_pkd.detect_image(img)
        assert len(bg) == len(bp)
        # set-style match: the packed path computes candidate logits in
        # bf16, so near-tied scores reorder — every generic det must have
        # a same-class packed det at the same place and score
        used = np.zeros(len(bp), bool)
        for i in range(len(bg)):
            cand = np.where(
                (~used) & (cp == cg[i])
                & (np.abs(bp - bg[i]).max(1) < 0.5)
                & (np.abs(sp - sg[i]) < 5e-3))[0]
            assert cand.size, f"unmatched det {i} (seed {seed})"
            used[cand[0]] = True


def test_detector_requires_some_fn():
    with pytest.raises(ValueError, match="forward_fn or detect_fn"):
        Detector(None, 4, 64)


class _FakeDet:
    """Minimal Detector stand-in exposing exactly the surface
    BatchingDetector touches (.tta/.img_size/._detect/._to_source), with a
    gate to hold the dispatcher mid-batch and scripted failures."""
    tta = False
    img_size = 64

    def __init__(self):
        self.calls = 0
        self.fail_on = set()       # 1-based _detect call numbers that raise
        self.poison_on = set()     # call numbers returning a fetch-poison
        self.gate = threading.Event()
        self.gate.set()

    def _detect(self, x):
        self.gate.wait()
        self.calls += 1
        if self.calls in self.fail_on:
            raise RuntimeError("dispatch boom")
        n = int(x.shape[0])
        if self.calls in self.poison_on:
            return _FetchPoison(n)
        return (np.zeros((n, 5, 4), np.float32), np.zeros((n, 5), np.float32),
                np.zeros((n, 5), np.int32), np.ones((n, 5), bool))

    def _to_source(self, b, s, c, v, meta, hw):
        return b[v], s[v], c[v]


class _FetchPoison:
    """Sentinel batch output that the patched jax.device_get rejects —
    simulates an async device failure surfacing at the fetch."""
    def __init__(self, n):
        self.n = n


def test_dispatch_failure_still_drains_in_flight():
    """A failed dispatch must fail ONLY its own futures; batches already in
    flight must resolve even with no further traffic (the old `continue`
    skipped the drain loop)."""
    det = _FakeDet()
    det.gate.clear()               # hold the dispatcher before _detect
    frame = _frames(1, seed=13)[0]
    bd = BatchingDetector(det, batch_size=1, max_wait_ms=1.0,
                          max_in_flight=2)
    try:
        fa = bd.submit(frame)      # call 1: dispatch ok, stays in flight
        fb = bd.submit(frame)      # call 2: dispatch raises
        det.fail_on = {2}
        det.gate.set()
        with pytest.raises(RuntimeError, match="dispatch boom"):
            fb.result(timeout=30)
        b, s, c = fa.result(timeout=30)   # in-flight batch still resolves
        assert b.shape == (5, 4)
        fc = bd.submit(frame)      # dispatcher alive for later requests
        assert fc.result(timeout=30)[0].shape == (5, 4)
    finally:
        assert bd.close() is True  # drain completed within the timeout


def test_fetch_failure_fails_batch_not_dispatcher(monkeypatch):
    """JAX surfaces most device errors at device_get, not at dispatch: the
    fetch raising must set the exception on that batch's futures and leave
    the dispatcher serving."""
    import jax as _jax
    real_get = _jax.device_get

    def fake_get(x):
        if isinstance(x, _FetchPoison):
            raise RuntimeError("device fell over at fetch")
        return real_get(x)

    monkeypatch.setattr(_jax, "device_get", fake_get)
    det = _FakeDet()
    det.poison_on = {1}
    frame = _frames(1, seed=17)[0]
    with BatchingDetector(det, batch_size=1, max_wait_ms=1.0) as bd:
        with pytest.raises(RuntimeError, match="fell over at fetch"):
            bd.detect(frame, timeout=30)
        b, s, c = bd.detect(frame, timeout=30)   # dispatcher survived
        assert b.shape == (5, 4)


def test_http_batcher_error_returns_500():
    """Batcher exceptions must come back as a JSON 500, not a dropped
    connection or a permanently pinned handler thread."""
    cv2 = pytest.importorskip("cv2")
    det = _FakeDet()
    det.fail_on = {1}
    with BatchingDetector(det, batch_size=1, max_wait_ms=1.0) as bd:
        srv = make_http_server(bd, host="127.0.0.1", port=0,
                               request_timeout=30.0)
        port = srv.server_address[1]
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        try:
            ok, buf = cv2.imencode(".png", _frames(1, seed=19)[0])
            assert ok
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=buf.tobytes(),
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 500
            assert "dispatch boom" in json.loads(ei.value.read())["error"]
            with urllib.request.urlopen(req, timeout=30) as r:  # still up
                assert len(json.loads(r.read())["boxes"]) == 5
        finally:
            srv.shutdown()
            srv.server_close()
            th.join(timeout=10)


def test_reset_stats(tiny_detector):
    with BatchingDetector(tiny_detector, batch_size=2,
                          max_wait_ms=5.0) as bd:
        bd.detect(_frames(1, seed=23)[0], timeout=120)
        assert bd.stats()["requests"] == 1
        bd.reset_stats()
        assert bd.stats() == {"requests": 0, "batches": 0,
                              "padded_slots": 0, "dispatched_slots": 0}


def test_serve_faster_rcnn_detector(tmp_path):
    """The --mode serve construction for the TWO-STAGE family:
    load_detector(cfg, tta=False) on a faster_rcnn config (generic
    forward+postprocess route — no packed YOLO step) wrapped in
    BatchingDetector. Pins that the per-image composition-transparency
    contract holds for the RCNN path too (RPN top-k / RoIAlign / NMS are
    all per-image fixed-shape) and that a padded tail batch serves."""
    import heltondetection_tpu
    from heltondetection_tpu.configs.base import (DataConfig,
                                                  ExperimentConfig,
                                                  ModelConfig, TestConfig)
    from heltondetection_tpu.engine.runner import build_model
    from heltondetection_tpu.models.faster_rcnn import init_faster_rcnn
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import TrainState
    from heltondetection_tpu.utils import ckpt as ckpt_io

    cfg = ExperimentConfig(
        name="serve_rcnn", work_dir=str(tmp_path),
        data=DataConfig(class_names=["a", "b", "c", "d"]),
        model=ModelConfig(family="faster_rcnn", backbone="resnet18",
                          num_classes=4, img_size=64),
        test=TestConfig(conf_thres=0.01))
    model = build_model(cfg.model, 4)
    v = init_faster_rcnn(model, jax.random.PRNGKey(0), 64)
    tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                       jnp.zeros((), jnp.int32), v["params"])
    ckpt_io.save_state(cfg.ckpt_dir, jax.device_get(state), 1)

    det = heltondetection_tpu.load_detector(cfg, tta=False)
    frames = _frames(3, seed=29)
    want = [det.detect_batch([f] * 2)[0] for f in frames]
    with BatchingDetector(det, batch_size=2, max_wait_ms=20.0) as bd:
        got = [f.result(timeout=300)
               for f in [bd.submit(fr) for fr in frames]]
        stats = bd.stats()
    assert stats["requests"] == 3 and stats["batches"] >= 2
    for (b1, s1, c1), (b2, s2, c2) in zip(want, got):
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(c1, c2)


def test_batching_detector_sharded_over_mesh(tiny_detector):
    """mesh=: every batch shards over the data axis (one server feeds all
    local chips, the evaluator's multi-chip pattern) with results identical
    to the unsharded batcher at the same batch size."""
    from heltondetection_tpu.parallel.mesh import create_mesh

    frames = _frames(8, seed=11)
    with BatchingDetector(tiny_detector, batch_size=8,
                          max_wait_ms=50.0) as bd:
        want = [f.result(timeout=120)
                for f in [bd.submit(fr) for fr in frames]]

    mesh = create_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    with BatchingDetector(tiny_detector, batch_size=8, max_wait_ms=50.0,
                          mesh=mesh) as bd:
        got = [f.result(timeout=120)
               for f in [bd.submit(fr) for fr in frames]]

    for (b1, s1, c1), (b2, s2, c2) in zip(want, got):
        np.testing.assert_allclose(b1, b2, atol=1e-4)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(c1, c2)

    with pytest.raises(ValueError, match="divide"):
        BatchingDetector(tiny_detector, batch_size=6, mesh=mesh)


def test_adaptive_batch_buckets(tiny_detector):
    """VERDICT r4 item 6: under light load the dispatcher sends the
    SMALLEST compiled bucket that holds the collection instead of padding
    the full batch — the measured 47% fill at clients < batch. A lone
    request at batch_size=8 rides the size-2 bucket (1 padded slot, not
    7), and results are identical to the single-image path."""
    import numpy as np
    with BatchingDetector(tiny_detector, batch_size=8, max_wait_ms=10.0,
                          batch_buckets=(2,)) as bd:
        assert bd.batch_buckets == [2, 8]
        bd.warmup()
        frame = _frames(1, seed=5)[0]
        want = tiny_detector.detect_image(frame)
        got = bd.detect(frame, timeout=120)
        stats = bd.stats()
    assert stats["batches"] == 1
    assert stats["padded_slots"] == 1          # bucket 2, one real frame
    assert stats["dispatched_slots"] == 2
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    # explicit bucket lists validate
    with pytest.raises(ValueError, match="batch_buckets"):
        BatchingDetector(tiny_detector, batch_size=8, batch_buckets=(16,))
    with BatchingDetector(tiny_detector, batch_size=8,
                          batch_buckets=(1, 4)) as bd2:
        assert bd2.batch_buckets == [1, 4, 8]
