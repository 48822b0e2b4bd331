"""Precompute + cluster instance style features (pix2pixHD workflow).

Rebuilds the reference's ``precompute_feature_maps`` / encode_features
pass (SURVEY.md §2.2 netE row): run the trained netE over the training
set, pool one style vector per instance, K-means them into
``--infer.n_clusters`` centroids, and save the table for test-time
sampling (``python test.py --cluster_path feats.npz``).

    python -m ir2rgb_tpu.cli.precompute_feats \
        --train.name exp1 --train.checkpoints_dir ./ckpts \
        --data.dataroot ./datasets/d --out feats.npz
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path = "features_clustered.npz"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            raise SystemExit("--out needs a path argument")
        out_path = argv[i + 1]
        del argv[i:i + 2]

    import jax

    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.config import parse_cli
    from ir2rgb_tpu.data import DataLoader
    from ir2rgb_tpu.infer.features import (
        collect_dataset_features,
        kmeans,
        save_clusters,
    )
    from ir2rgb_tpu.train.model import create_model

    cfg = parse_cli(argv)
    if not cfg.model.use_instance_feat:
        raise SystemExit(
            "precompute_feats needs a use_instance_feat model "
            "(--model.use_instance_feat true)")

    loader = DataLoader(cfg, phase=cfg.data.phase, shuffle=False)
    model = create_model(cfg, steps_per_epoch=max(len(loader), 1))
    ckpt = CheckpointManager(os.path.join(cfg.run_dir(), "ckpt"))
    step = ckpt.step_for_label(cfg.infer.which_epoch)
    state = ckpt.restore(step)
    g_params = (state["g_params"] if isinstance(state, dict)
                else state.g_params)

    feats = collect_dataset_features(model, jax.device_get(g_params),
                                     loader.epoch())
    centers = kmeans(feats, cfg.infer.n_clusters)
    save_clusters(out_path, centers)
    print(f"clustered {feats.shape[0]} instance features "
          f"({feats.shape[1]}-d) -> {len(centers)} centers -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
