"""One-time converter: reference ``.pt`` checkpoint -> native ``.npz``.

Published reference checkpoints (pspv5s.pt / pspv5m.pt) pickle whole
nn.Modules, so loading them requires torch + the reference code importable.
This tool does the conversion once so deployments need neither:

    python -m multiyolov5_tpu.tools.convert_pt pspv5s.pt pspv5s.npz \
        [--ref /path/to/multiyolov5]

After conversion, ``Engine("pspv5s.npz")`` and the CLIs load it torch-free.
"""

from __future__ import annotations

import argparse
import json
import os


def convert(pt_path: str, out_path: str, ref: str = None) -> str:
    if ref:
        os.environ["MULTIYOLOV5_REF"] = ref
    from ..models.config import load_spec
    from ..utils.checkpoint import load_pt, save_npz

    params, state, meta = load_pt(pt_path)
    spec_yaml = meta.get("yaml")
    tree = {
        "params": params,
        "state": state,
        "spec_yaml": json.dumps(spec_yaml) if spec_yaml else None,
        "epoch": meta.get("epoch"),
        "best_fitness": meta.get("best_fitness"),
    }
    save_npz(out_path, tree)
    if spec_yaml:
        spec = load_spec(spec_yaml)
        print(f"converted {pt_path} -> {out_path} "
              f"({len(params)} params, nc={spec.nc}, n_segcls={spec.n_segcls})")
    else:
        print(f"converted {pt_path} -> {out_path} ({len(params)} params; "
              f"no embedded config — pass --cfg at load time)")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pt_path")
    ap.add_argument("out_path")
    ap.add_argument("--ref", help="reference repo checkout (for unpickling)")
    a = ap.parse_args(argv)
    convert(a.pt_path, a.out_path, a.ref)


if __name__ == "__main__":
    main()
