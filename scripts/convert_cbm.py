#!/usr/bin/env python
"""Convert a CatBoost binary model (``.cbm``) to the JSON export format.

The reference ml-pipeline loads ``catboost_latest.cbm`` with the
catboost library (services/ml-pipeline/app/main.py:74-86).  This image
ships no catboost and the ``.cbm`` payload is a flatbuffers blob with
no published schema (docs/adr/ADR-001-cbm.md), so the in-image loader
(`lameness_tpu.ml.gbdt_io.load_reference_model`) reads the documented
JSON export format instead (``catboost_latest.json``).

Run THIS script once on any host that has the catboost library — e.g.
the reference deployment that produced the ``.cbm`` — to emit the JSON
twin next to it:

    python scripts/convert_cbm.py /path/to/catboost_latest.cbm

It also cross-checks that the JSON the library wrote re-predicts the
same probabilities as the binary model on random feature vectors, so a
converted file is known-good before it is shipped to a TPU host.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def convert(cbm_path: Path, out_path: Path | None = None,
            n_check: int = 256, seed: int = 0) -> Path:
    try:
        from catboost import CatBoostClassifier
    except ImportError:
        sys.exit("catboost is not installed on this host. Run this "
                 "script where the .cbm was produced (the reference "
                 "ml-pipeline image has it); the TPU image deliberately "
                 "ships without it — see docs/adr/ADR-001-cbm.md.")

    model = CatBoostClassifier()
    model.load_model(str(cbm_path))
    out = out_path or cbm_path.with_suffix(".json")
    model.save_model(str(out), format="json")

    # round-trip check: our lib-free reader must agree with the library
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from lameness_tpu.ml.gbdt_io import CatboostJsonModel
    ours = CatboostJsonModel(out)
    n_feat = len(model.feature_names_) if model.feature_names_ \
        else model.n_features_in_
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_check, n_feat))
    theirs = model.predict_proba(x)[:, 1]
    got = ours.predict_proba(x)[:, 1]
    err = float(np.max(np.abs(theirs - got)))
    if err > 1e-6:
        sys.exit(f"round-trip mismatch: max |Δp| = {err:.3e} — refusing "
                 f"to bless {out}")
    print(f"wrote {out}  (round-trip max |Δp| = {err:.2e} over "
          f"{n_check} random vectors)")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("cbm", type=Path, help="path to catboost_latest.cbm")
    ap.add_argument("--out", type=Path, default=None,
                    help="output JSON path (default: alongside the .cbm)")
    args = ap.parse_args()
    convert(args.cbm, args.out)


if __name__ == "__main__":
    main()
