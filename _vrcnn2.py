import time, numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
    init_faster_rcnn, faster_rcnn_infer)
cfg = RCNNConfig(num_classes=20, img_size=512, max_gt=32)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
variables = init_faster_rcnn(model, jax.random.PRNGKey(0), cfg.img_size)
print("init ok", flush=True)
B=4
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0,1,(B,512,512,3)).astype(np.float32))
inf = jax.jit(lambda v, im: faster_rcnn_infer(model, v, im, cfg)[1].astype(jnp.float32).sum())
t0=time.perf_counter(); _ = float(inf(variables, imgs))
print(f"infer compile {time.perf_counter()-t0:.0f}s", flush=True)
for trial in range(3):
    t0=time.perf_counter()
    acc=jnp.zeros(())
    for i in range(10):
        acc = acc + inf(variables, imgs)
    _ = float(acc)
    dt=(time.perf_counter()-t0)/10
    print(f"infer trial {trial}: {dt*1e3:.0f} ms/batch ({B/dt:.1f} img/s)", flush=True)
