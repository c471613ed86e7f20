"""Pretrained-checkpoint quality on an arbitrary image directory.

Round-3 evidence script (VERDICT round-2 next #4): the same masked P/R/F1
metric surface as the pretraining driver (pretraining.cpp:32-89 parity),
run over a full directory — used to report BOTH evaluation protocols
side by side:

  * datasets/val         — STRICT: sources held out by family, zero pixel
                           overlap with training data (round-3 hygiene fix);
  * datasets/val_indist  — the reference-protocol analog: same source
                           distribution as training, disjoint crops (the
                           reference validates on same-distribution ImageNet
                           images, pretraining.cpp:215-262).

Usage:
  PYTHONPATH=.:/root/.axon_site python benchmarks/eval_quality.py \
      --ckpt runs/r3/fcn_pretrained_<ts>_best [--dirs datasets/val ...]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dirs", nargs="*",
                    default=[str(REPO / "datasets" / "val"),
                             str(REPO / "datasets" / "val_indist")])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=256)
    ap.add_argument("--thresholds", default="0.5",
                    help="comma list of connect/cut decision thresholds; "
                    "more than one sweeps the P-R tradeoff (the reference's "
                    "reported operating point is its implicit 0.5, "
                    "readme.md:52 — sweeping lets us compare recall AT its "
                    "precision)")
    args = ap.parse_args()
    thresholds = [float(t) for t in args.thresholds.split(",")]

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config
    from image_compression_tpu.io.image_io import (
        find_image_files_recursively, load_image, to_float01_rgb)
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.targets import create_target_with_mask
    from image_compression_tpu.train.checkpoint import load_params
    from image_compression_tpu.train.metrics import edge_metrics
    from image_compression_tpu.train.steps import make_pretrain_eval

    cfg = Config()
    model = EdgeUNet()
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 256, 256, 3), jnp.float32))
    params = load_params(args.ckpt, template=template)
    evaluate = make_pretrain_eval(model, cfg)

    @jax.jit
    def targets_for(images):
        return create_target_with_mask(images, cfg.edge_target)

    @jax.jit
    def sweep_metrics(params, images, targets):
        out = model.apply(params, images)
        return tuple(edge_metrics(out, targets, thresh=t)
                     for t in thresholds)

    report = {"ckpt": str(args.ckpt), "edge_target": cfg.edge_target.value,
              "thresholds": thresholds}
    for d in args.dirs:
        paths = find_image_files_recursively(d, cfg.image_format)
        paths = [p for p in paths][:args.limit]
        total = None
        sweep_total = None
        loss_sum = 0.0
        n_batches = 0
        for i in range(0, len(paths) - len(paths) % args.batch, args.batch):
            imgs = np.stack([to_float01_rgb(load_image(p))
                             for p in paths[i:i + args.batch]])
            images = jnp.asarray(imgs)
            targets = targets_for(images)
            aux, metrics = evaluate(params, images, targets)
            loss_sum += float(aux["loss"])
            n_batches += 1
            total = metrics if total is None else jax.tree_util.tree_map(
                lambda a, b: a + b, total, metrics)
            if len(thresholds) > 1:
                sm = sweep_metrics(params, images, targets)
                sweep_total = sm if sweep_total is None \
                    else jax.tree_util.tree_map(
                        lambda a, b: a + b, sweep_total, sm)
        s = total.summary()
        key = pathlib.Path(d).name
        report[key] = {
            "images": n_batches * args.batch,
            "loss": round(loss_sum / max(n_batches, 1), 4),
            **{k: round(float(v), 4) for k, v in s.items()},
        }
        if sweep_total is not None:
            curve = []
            for t, m in zip(thresholds, sweep_total):
                ms = m.summary()
                curve.append({"thresh": t,
                              **{k: round(float(ms[k]), 4)
                                 for k in ("precision_cut", "recall_cut",
                                           "f1_cut", "f1_conn")}})
            report[key]["pr_curve"] = curve
        print(json.dumps({key: report[key]}), flush=True)
    print(json.dumps({"metric": "pretrain_quality", **report}))


if __name__ == "__main__":
    main()
