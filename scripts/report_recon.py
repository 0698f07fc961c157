"""Summarize a finished reproduction run: loss trajectory, per-sensor
preview PSNR, and recovered-vs-ground-truth grid error (GT resampled to
the optimized resolution).  Prints one JSON line per run dir.

    python scripts/report_recon.py outputs_r2/janga-smoke/volpathsimple-drt \
        --config janga-smoke [--scene-dir /nonexistent]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--config", required=True)
    ap.add_argument("--scene-dir", default=None,
                    help="UIVR_SCENE_DIR used for the run (procedural "
                         "stand-in runs pass a nonexistent dir)")
    args = ap.parse_args()
    if args.scene_dir is not None:
        os.environ["UIVR_SCENE_DIR"] = args.scene_dir

    os.environ["JAX_PLATFORMS"] = "cpu"     # report math runs on CPU
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax.numpy as jnp

    from uivr_tpu.config import get_scene_config
    from uivr_tpu.core.grids import resize_trilinear
    from uivr_tpu.core.vol_io import read_vol

    preset = get_scene_config(args.config)
    gt = np.asarray(preset.build_ref().params.sigma_t)

    for run in args.run_dirs:
        rec = {"run": run, "config": args.config}
        mpath = os.path.join(run, "metrics.jsonl")
        if os.path.isfile(mpath):
            losses, psnrs = [], {}
            for line in open(mpath):
                try:
                    m = json.loads(line)
                except ValueError:
                    continue
                if "loss" in m:
                    losses.append((m["it"], m["loss"]))
                if m.get("preview") is not None and "psnr" in m:
                    psnrs.setdefault(m["preview"], {})[m["sensor"]] = \
                        m["psnr"]
            if losses:
                rec["first_loss"] = round(losses[0][1], 6)
                rec["final_it"] = losses[-1][0]
                rec["final_loss"] = round(losses[-1][1], 6)
            rec["preview_psnr"] = psnrs
        fin = os.path.join(run, "params", "final-medium1_sigma_t.vol")
        if os.path.isfile(fin):
            data, _ = read_vol(fin)
            gt_r = np.asarray(resize_trilinear(jnp.asarray(gt),
                                               data.shape[:3]))
            num = np.abs(data - gt_r).sum()
            rec["grid_rel_l1_vs_gt"] = round(
                float(num / max(gt_r.sum(), 1e-9)), 4)
            rec["final_grid_shape"] = list(data.shape)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
