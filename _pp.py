import time, functools, numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.ops.nms import batched_nms
nc=80; B=128; N=25200
rng = np.random.default_rng(0)
raw_shapes = [(B,80,80,255),(B,40,40,255),(B,20,20,255)]
raws = [jnp.asarray(rng.normal(-3,1.5,s).astype(np.float32)) for s in raw_shapes]

from heltondetection_tpu.models.yolov5 import decode_full
from heltondetection_tpu.engine.evaluator import multilabel_candidates

def pp_current(raws):
    b,o,c = decode_full(raws, nc)
    def one(bb,oo,cc):
        cb, cs, ccls = multilabel_candidates(bb,oo,cc, topk=1024, conf_thres=0.001)
        return batched_nms(cb, cs, ccls, iou_thres=0.65, score_thres=0.001,
                           pre_nms_topk=1024, max_det=300)
    return jax.vmap(one)(b,o,c)[1].astype(jnp.float32).sum()

def ml_approx(bb, oo, cc):
    n, c = cc.shape
    best = oo * jnp.max(cc, axis=-1)
    _, box_i = jax.lax.approx_max_k(best, 1024, recall_target=0.99)
    sel_boxes = bb[box_i]
    conf = oo[box_i,None]*cc[box_i]
    flat = jnp.where(conf>0.001, conf, 0.0).reshape(-1)
    ts, ti = jax.lax.approx_max_k(flat, 1024, recall_target=0.99)
    return sel_boxes[ti//c], ts, (ti%c).astype(jnp.int32)

def pp_approx(raws):
    b,o,c = decode_full(raws, nc)
    def one(bb,oo,cc):
        cb, cs, ccls = ml_approx(bb,oo,cc)
        return batched_nms(cb, cs, ccls, iou_thres=0.65, score_thres=0.001,
                           pre_nms_topk=1024, max_det=300)
    return jax.vmap(one)(b,o,c)[1].astype(jnp.float32).sum()

for name, f in (("current", pp_current), ("approx", pp_approx)):
    g = jax.jit(f)
    t0=time.perf_counter(); _=float(g(raws)); ct=time.perf_counter()-t0
    for _ in range(2):
        acc=jnp.zeros(())
        for k in range(5): acc=acc+g(raws)
        _=float(acc)
    t0=time.perf_counter(); acc=jnp.zeros(())
    for k in range(15): acc=acc+g(raws)
    _=float(acc)
    dt=(time.perf_counter()-t0)/15
    print(f"{name}: compile {ct:.0f}s, {dt*1e3:.1f} ms/batch(B={B})", flush=True)
