"""Auto-resume interrupted trainings (reference utils/aws/resume.py).

Scans a runs directory for interruptible ``last.npz`` checkpoints that are
not finished and respawns training with ``--resume``.  Multi-host relaunch
maps to one process per host with jax.distributed coordinates instead of
torch.distributed.launch.

Run: python -m multiyolov5_tpu.tools.resume --dir runs/train
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
from pathlib import Path

import yaml


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/train")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    port = 0
    for last in sorted(glob.glob(f"{args.dir}/**/last.npz", recursive=True)):
        run_dir = Path(last).parent.parent
        opt_file = run_dir / "opt.yaml"
        if not opt_file.exists():
            continue
        with open(opt_file) as fh:
            opt = yaml.safe_load(fh)
        # finished runs have been strip_optimizer'd (no 'opt' entry)
        import numpy as np
        try:
            with np.load(last, allow_pickle=False) as z:
                import json as _json
                skel = _json.loads(bytes(z["__skeleton__"]).decode())
            finished = "opt" not in skel or skel.get("opt", {}).get("__none__")
        except Exception:
            finished = False
        if finished:
            print(f"skip finished run {run_dir}")
            continue
        cmd = [sys.executable, "-m", "multiyolov5_tpu.cli.train",
               "--resume", "--weights", last,
               "--cfg", str(opt.get("cfg", "yolov5s_city_seg")),
               "--data", str(opt.get("data")),
               "--project", str(run_dir.parent), "--name", run_dir.name,
               "--exist-ok"]
        print(" ".join(cmd))
        if not args.dry_run:
            subprocess.Popen(cmd)
        port += 1
    if port == 0:
        print("no interruptible runs found")


if __name__ == "__main__":
    main()
