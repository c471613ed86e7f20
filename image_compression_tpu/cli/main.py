"""Unified CLI: `python -m image_compression_tpu.cli.main <command>`.

Commands mirror the reference's five executables (CMakeLists.txt:43-176)
with runtime flags instead of compile-time constants — same option surface,
now configurable (SURVEY.md section 5, config system).
"""

from __future__ import annotations

import argparse
import json
import sys

from image_compression_tpu.config import Config, EdgeTarget


def _add_config_arg(p):
    p.add_argument("--config", help="JSON config file (Config.to_dict schema)")
    p.add_argument("--dataset-dir", dest="dataset_dir")
    p.add_argument("--val-dataset-dir", dest="val_dataset_dir")
    p.add_argument("--results-dir", dest="results_dir")
    p.add_argument("--image-size", dest="image_size", type=int)


def _load_config(args) -> Config:
    cfg = Config.from_json(args.config) if args.config else Config()
    for key in ("dataset_dir", "val_dataset_dir", "results_dir",
                "image_size"):
        val = getattr(args, key, None)
        if val is not None:
            setattr(cfg, key, val)
    return cfg


def cmd_compress(args):
    from image_compression_tpu.pipeline import compress_directory
    from image_compression_tpu.train.checkpoint import load_params

    cfg = _load_config(args)
    if getattr(args, "pack", False):
        cfg.slice_container = "pack"
    if getattr(args, "no_fallback", False):
        cfg.compress_fallback = False
    params = load_params(args.checkpoint) if args.checkpoint else None
    classical = EdgeTarget(args.classical) if args.classical else None
    dirs = compress_directory(cfg, params=params, limit=args.limit,
                              classical=classical)
    print(json.dumps({"compressed": [str(d) for d in dirs]}))


def cmd_reassemble(args):
    from image_compression_tpu.io.reassemble import reassemble

    ok = reassemble(args.slice_dir, args.output)
    print(f"Reconstructed image written to {args.output}" if ok
          else "reassembly failed")
    if not ok:
        sys.exit(1)


def cmd_convert(args):
    from image_compression_tpu.io.converter import convert_dataset

    n = convert_dataset(args.dataset_dir or "dataset",
                        source_format=args.source_format,
                        width=args.size, height=args.size)
    print(f"converted {n} images")


def cmd_pretrain(args):
    from image_compression_tpu.train.pretrain import run_pretraining

    cfg = _load_config(args)
    if args.epochs:
        cfg.pretrain.epochs = args.epochs
    _state, run_id = run_pretraining(cfg, resume=args.resume,
                                     init_params=args.init_params)
    print(f"pretraining done, run id {run_id}")


def cmd_train(args):
    from image_compression_tpu.train.checkpoint import (CheckpointManager,
                                                        load_params)
    from image_compression_tpu.train.reinforce import run_reinforce
    from image_compression_tpu.train.steps import TrainState

    cfg = _load_config(args)
    if args.epochs:
        cfg.rl.epochs = args.epochs
    if args.checkpoint.endswith("_params"):
        params = load_params(args.checkpoint)
    else:
        restored = CheckpointManager.restore_path(args.checkpoint, None)
        params = restored["params"] if isinstance(restored, dict) else \
            TrainState(*restored).params
    _state, run_id = run_reinforce(cfg, params, resume=args.resume)
    print(f"training done, run id {run_id}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="image_compression_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("compress", help="segment + slice images (compress.cpp)")
    _add_config_arg(p)
    p.add_argument("--checkpoint", help="pretrained params (learned costs)")
    p.add_argument("--classical", choices=[e.value for e in EdgeTarget],
                   help="classical extractor instead of the U-Net")
    p.add_argument("--limit", type=int, help="max images")
    p.add_argument("--pack", action="store_true",
                   help="one SLPK container file per image instead of a "
                        "directory of slice PNGs (reassemble reads both)")
    p.add_argument("--no-fallback", action="store_true",
                   help="always slice, like the reference (disable the "
                        "per-image single-slice fallback when the size "
                        "model predicts slicing would expand the image)")
    p.set_defaults(fn=cmd_compress)

    p = sub.add_parser("reassemble", help="rebuild from slices (reassemble.cpp)")
    p.add_argument("slice_dir")
    p.add_argument("-o", "--output", default="reconstructed.png")
    p.set_defaults(fn=cmd_reassemble)

    p = sub.add_parser("convert", help="dataset prep (image_converter.cpp)")
    _add_config_arg(p)
    p.add_argument("--source-format", default="jpeg")
    p.add_argument("--size", type=int, default=256)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("pretrain", help="supervised phase (pretraining.cpp)")
    _add_config_arg(p)
    p.add_argument("--epochs", type=int)
    p.add_argument("--resume", help="checkpoint path to continue from")
    p.add_argument("--init-params", help="params-only checkpoint to "
                   "warm-start from (domain fine-tuning; optimizer state "
                   "and step start fresh)")
    p.set_defaults(fn=cmd_pretrain)

    p = sub.add_parser("train", help="REINFORCE phase (training.cpp)")
    _add_config_arg(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--epochs", type=int)
    p.add_argument("--resume", help="RL checkpoint path to continue from")
    p.set_defaults(fn=cmd_train)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
