"""Training entry point (reference train_with_trainer.py).

Usage:
    python train_with_trainer.py \
        --gin_configs=configs/nerf_ngp_yobo_hotdog.gin \
        --gin_bindings="Trainer.stage='cache'" \
        --gin_bindings="Config.checkpoint_dir='/tmp/ckpt/hotdog_cache'"
"""

from __future__ import annotations

import argparse

from neural_radiance_caching_tpu.engine import configs
from neural_radiance_caching_tpu.engine import gin_config as gin


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--gin_configs", action="append", default=[], help="gin config file(s)"
    )
    parser.add_argument(
        "--gin_bindings", action="append", default=[], help="gin binding override(s)"
    )
    parser.add_argument("--logtostderr", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    bindings = [b.strip('"') for b in args.gin_bindings]
    configs.load_config(config_files=args.gin_configs, bindings=bindings)

    from neural_radiance_caching_tpu.engine.trainer import Trainer

    trainer = Trainer()
    trainer.setup()
    trainer.train()


if __name__ == "__main__":
    main()
