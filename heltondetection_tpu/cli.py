"""One-command CLI — rebuild target C1 (README.md:12 "命令行一键训练/评估/测试"):

    python -m heltondetection_tpu.cli --mode train --config cfg.py
    python -m heltondetection_tpu.cli --mode eval  --config cfg.py
    python -m heltondetection_tpu.cli --mode test  --config cfg.py \
        --source img.jpg --out out.jpg
    python -m heltondetection_tpu.cli --mode export --config cfg.py \
        --out model.stablehlo
    python -m heltondetection_tpu.cli --mode serve --config cfg.py \
        --port 8000 --serve-batch 16
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("heltondetection_tpu")
    p.add_argument("--mode", required=True,
                   choices=["train", "eval", "test", "export", "serve"])
    p.add_argument("--config", required=True, help="python config file")
    p.add_argument("--source", default=None,
                   help="test mode: image/video path")
    p.add_argument("--out", default=None, help="output path")
    p.add_argument("--no-resume", action="store_true",
                   help="train mode: ignore existing checkpoints")
    p.add_argument("--host", default="0.0.0.0", help="serve mode: bind host")
    p.add_argument("--port", type=int, default=8000,
                   help="serve mode: bind port")
    p.add_argument("--serve-batch", type=int, default=16,
                   help="serve mode: static device batch size")
    p.add_argument("--serve-wait-ms", type=float, default=5.0,
                   help="serve mode: max wait to fill a batch")
    args = p.parse_args(argv)

    from heltondetection_tpu.configs.base import load_config
    cfg = load_config(args.config)

    if args.mode == "train":
        from heltondetection_tpu.engine.runner import run_train
        run_train(cfg, resume=not args.no_resume)
    elif args.mode == "eval":
        from heltondetection_tpu.engine.runner import run_eval
        run_eval(cfg, dump_json=args.out)
    elif args.mode == "test":
        if not args.source:
            p.error("--mode test requires --source")
        from heltondetection_tpu.engine.runner import run_test
        out = run_test(cfg, args.source, args.out)
        print({k: (v.tolist() if hasattr(v, "tolist") else v)
               for k, v in out.items()})
    elif args.mode == "export":
        from heltondetection_tpu.engine.runner import (_config_num_classes,
                                                       _load_eval_variables,
                                                       build_model)
        from heltondetection_tpu.engine.export import export_model
        model = build_model(cfg.model, _config_num_classes(cfg))
        variables = _load_eval_variables(cfg, model)
        export_model(cfg, model, variables, args.out or "model.stablehlo")
    elif args.mode == "serve":
        import jax

        from heltondetection_tpu.engine.runner import load_detector
        from heltondetection_tpu.engine.serve import (BatchingDetector,
                                                      serve_http)
        det = load_detector(cfg, tta=False)
        # multi-chip serving: shard each batch over all local devices
        # (the same pattern eval uses) when the batch divides evenly
        mesh = None
        n_dev = len(jax.devices())
        if jax.process_count() == 1 and n_dev > 1 \
                and args.serve_batch % n_dev == 0:
            from heltondetection_tpu.parallel.mesh import create_mesh
            mesh = create_mesh()
        with BatchingDetector(det, batch_size=args.serve_batch,
                              max_wait_ms=args.serve_wait_ms,
                              mesh=mesh) as batcher:
            serve_http(batcher, host=args.host, port=args.port,
                       class_names=cfg.data.class_names)
    return 0


if __name__ == "__main__":
    sys.exit(main())
