import time, numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.yolov5 import build_yolov5, decode_full
from heltondetection_tpu.engine.evaluator import make_postprocess
nc=80
model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,640,640,3)), train=False)
post = make_postprocess(nc, conf_thres=0.001, iou_thres=0.65, pre_nms_topk=1024, max_det=300)
for B in (64, 128, 256):
    @jax.jit
    def serve(v, u8):
        images = u8.astype(jnp.float32)/255.0
        outs = model.apply(v, images, train=False)
        b,o,c = decode_full(outs, nc)
        return post(b,o,c)[1].astype(jnp.float32).sum()
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.integers(0,255,(B,640,640,3)), jnp.uint8) for _ in range(2)]
    t0=time.perf_counter(); _ = float(serve(variables, inputs[0]))
    ct=time.perf_counter()-t0
    for _ in range(2):
        acc=jnp.zeros(())
        for k in range(5): acc=acc+serve(variables, inputs[k%2])
        _=float(acc)
    t0=time.perf_counter()
    acc=jnp.zeros(())
    K=20
    for k in range(K): acc=acc+serve(variables, inputs[k%2])
    _=float(acc)
    dt=(time.perf_counter()-t0)/K
    print(f"serve B={B}: compile {ct:.0f}s, {dt*1e3:.1f} ms/batch = {B/dt:.0f} img/s", flush=True)
