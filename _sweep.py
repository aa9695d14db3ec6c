import time, numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.yolov5 import build_yolov5
nc=80
model = build_yolov5("s", num_classes=nc, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,640,640,3)), train=False)
for B in (32, 64, 128):
    fwd = jax.jit(lambda v, im: sum(o.astype(jnp.float32).sum() for o in model.apply(v, im, train=False)))
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.uniform(0,1,(B,640,640,3)).astype(np.float32)) for _ in range(2)]
    t0=time.perf_counter(); _ = float(fwd(variables, inputs[0]))
    ct=time.perf_counter()-t0
    # warm 2 rounds then measure
    for _ in range(2):
        acc=jnp.zeros(());
        for k in range(5): acc=acc+fwd(variables, inputs[k%2])
        _=float(acc)
    t0=time.perf_counter()
    acc=jnp.zeros(())
    K=20
    for k in range(K): acc=acc+fwd(variables, inputs[k%2])
    _=float(acc)
    dt=(time.perf_counter()-t0)/K
    print(f"B={B}: compile {ct:.0f}s, {dt*1e3:.1f} ms/batch = {B/dt:.0f} img/s", flush=True)
