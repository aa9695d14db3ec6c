"""One-command CLI — rebuild target C1 (README.md:12 "命令行一键训练/评估/测试"):

    python -m heltondetection_tpu.cli --mode train --config cfg.py
    python -m heltondetection_tpu.cli --mode eval  --config cfg.py
    python -m heltondetection_tpu.cli --mode test  --config cfg.py \
        --source img.jpg --out out.jpg
    python -m heltondetection_tpu.cli --mode export --config cfg.py \
        --out model.stablehlo
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("heltondetection_tpu")
    p.add_argument("--mode", required=True,
                   choices=["train", "eval", "test", "export"])
    p.add_argument("--config", required=True, help="python config file")
    p.add_argument("--source", default=None,
                   help="test mode: image/video path")
    p.add_argument("--out", default=None, help="output path")
    p.add_argument("--no-resume", action="store_true",
                   help="train mode: ignore existing checkpoints")
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
