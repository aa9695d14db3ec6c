import time, numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.ops.nms import batched_nms, nms_mask_fixpoint
from heltondetection_tpu.models.yolov5 import decode_full
from heltondetection_tpu.engine.evaluator import multilabel_candidates
nc=80; B=128
rng = np.random.default_rng(0)
raws = [jnp.asarray(rng.normal(-3,1.5,s).astype(np.float32)) for s in
        [(B,80,80,255),(B,40,40,255),(B,20,20,255)]]

def timeit(name, f, *args):
    g = jax.jit(f)
    t0=time.perf_counter(); r=g(*args); jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], r); ct=time.perf_counter()-t0
    for _ in range(2):
        for k in range(5): r=g(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], r)
    t0=time.perf_counter()
    for k in range(15): r=g(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], r)
    dt=(time.perf_counter()-t0)/15
    print(f"{name}: compile {ct:.0f}s, {dt*1e3:.1f} ms", flush=True)
    return jax.device_get(r) if name=="decode" else None

# 1. decode only
dec = timeit("decode", lambda r: decode_full(r, nc), raws)
b, o, c = [jnp.asarray(x) for x in dec]
# 2. candidates only
timeit("candidates", lambda bb,oo,cc: jax.vmap(
    lambda b1,o1,c1: multilabel_candidates(b1,o1,c1, topk=1024, conf_thres=0.001))(bb,oo,cc), b,o,c)
cb, cs, cc2 = jax.jit(lambda bb,oo,cc: jax.vmap(lambda b1,o1,c1: multilabel_candidates(b1,o1,c1, topk=1024, conf_thres=0.001))(bb,oo,cc))(b,o,c)
cb, cs, cc2 = jnp.asarray(np.asarray(cb)), jnp.asarray(np.asarray(cs)), jnp.asarray(np.asarray(cc2))
# 3. NMS only
timeit("nms", lambda xb,xs,xc: jax.vmap(lambda b1,s1,c1: batched_nms(
    b1,s1,c1, iou_thres=0.65, score_thres=0.001, pre_nms_topk=1024,
    max_det=300))(xb,xs,xc), cb, cs, cc2)
