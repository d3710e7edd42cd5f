"""Reference-corpus readiness checker (VERDICT r3 #8).

The reference's real corpora cannot be downloaded in this environment
(zero egress): TSFragment-600K (README.md:185-189 "Quick Reproduce",
huggingface WinfredGe/TSFragment-600K), the MMD six domains and SUSHI
(datafactory/dataloader.py:26-78). This tool makes the blocked baselines
ready-to-run the day the data exists:

  * ``--baseline {tsfragment,mmd,sushi,all}`` validates that every CSV
    the reproduction commands will consume is PRESENT at --data_root and
    SCHEMA-parses (Text / OT / TextEmbedding columns, reference
    datafactory/dataset.py:72-96), emitting one JSON line; exit 1 on any
    missing/invalid file.
  * ``--make_standins`` writes synthetic stand-ins in the exact real
    layout so `scripts/reproduce_reference.sh --check` can drive the
    full reference-config pipeline hermetically.

Usage:
    python scripts/reference_data_check.py --data_root ./Data
    python scripts/reference_data_check.py --data_root /tmp/d --make_standins
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The 12-op-point quality table families (reference scripts/script.sh:4-46,
# scripts_validation_only.sh:1-18).
TABLE_FAMILIES = ["exchangerate", "electricity", "traffic", "ETTh1"]
MMD_DOMAINS = ["Agriculture", "Climate", "Health_US", "Traffic", "Economy",
               "SocialGood"]
LENGTHS = (24, 48, 96)


def expected_files(baseline: str, data_root: str) -> list:
    """Every CSV the baseline's reproduction commands consume, as
    (path, purpose) pairs — derived from provider.t2s_loader_provider:
    mix-train reads {name}_{L} from the mix root, infer/eval read the
    explicit-length name from the split root."""
    out = []
    if baseline == "tsfragment":
        for fam in TABLE_FAMILIES:
            for L in LENGTHS:
                out.append((os.path.join(
                    data_root, "TSFragment-600K",
                    f"embedding_cleaned_{fam}_{L}.csv"), "mix-train"))
                out.append((os.path.join(
                    data_root, "our",
                    f"embedding_cleaned_{fam}_{L}.csv"), "infer/eval"))
    elif baseline == "mmd":
        for dom in MMD_DOMAINS:
            for L in LENGTHS:
                # one MMD root serves both periods (dataloader.py:100-103)
                out.append((os.path.join(
                    data_root, "MMD",
                    f"embedding_cleaned_{dom}_{L}.csv"), "train+eval"))
    elif baseline == "sushi":
        out.append((os.path.join(data_root, "SUSHI",
                                 "embedding_cleaned_SUSHI.csv"),
                    "train+eval"))
    else:
        raise ValueError(baseline)
    return out


def schema_check(path: str) -> str | None:
    """Parse the head of a CSV against the reference row schema
    (datafactory/dataset.py:72-96). Returns an error string or None."""
    import pandas as pd
    try:
        df = pd.read_csv(path, nrows=3)
    except Exception as e:  # noqa: BLE001 - report as schema failure
        return f"unreadable: {e}"
    for col in ("Text", "OT", "TextEmbedding"):
        if col not in df.columns:
            return f"missing column {col}"
    try:
        series = ast.literal_eval(df["OT"].iloc[0])
        assert isinstance(series, list) and len(series) > 0
    except Exception:
        return "OT column does not parse as a list of floats"
    emb = str(df["TextEmbedding"].iloc[0])
    try:
        if "," in emb:                       # MMD/SUSHI comma style
            vec = ast.literal_eval(emb)
        else:                                # TSFragment space style
            vec = [float(v) for v in emb.strip("[] \n").split()]
        assert len(vec) > 0
    except Exception:
        return "TextEmbedding parses in neither space nor comma format"
    return None


def make_standins(data_root: str, sushi_t: int, n: int, seed: int) -> None:
    """Synthetic stand-ins in the exact real layout. The real SUSHI is
    len-2048; --check uses a shorter stand-in so the hermetic pipeline
    proof stays CPU-feasible (pass --sushi_t 2048 for the real-length
    long-series path on a chip)."""
    from t2ms_tpu.data.synthetic import write_t2s_csv
    for fam in TABLE_FAMILIES:
        for L in LENGTHS:
            for sub in ("TSFragment-600K", "our"):
                write_t2s_csv(os.path.join(
                    data_root, sub, f"embedding_cleaned_{fam}_{L}.csv"),
                    n=n, T=L, seed=seed + L)
    for dom in MMD_DOMAINS:
        for L in LENGTHS:
            write_t2s_csv(os.path.join(
                data_root, "MMD", f"embedding_cleaned_{dom}_{L}.csv"),
                n=n, T=L, seed=seed + L, mmd_style=True)
    write_t2s_csv(os.path.join(data_root, "SUSHI",
                               "embedding_cleaned_SUSHI.csv"),
                  n=max(n, 120), T=sushi_t, seed=seed, mmd_style=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="./Data")
    ap.add_argument("--baseline", default="all",
                    choices=["tsfragment", "mmd", "sushi", "all"])
    ap.add_argument("--make_standins", action="store_true")
    ap.add_argument("--sushi_t", type=int, default=256,
                    help="stand-in SUSHI length (real corpus: 2048)")
    ap.add_argument("--standin_rows", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.make_standins:
        make_standins(args.data_root, args.sushi_t, args.standin_rows,
                      args.seed)
        print(f"stand-ins written under {args.data_root}", file=sys.stderr)

    baselines = (["tsfragment", "mmd", "sushi"] if args.baseline == "all"
                 else [args.baseline])
    report, ok = {}, True
    for b in baselines:
        missing, bad = [], []
        files = expected_files(b, args.data_root)
        for path, purpose in files:
            if not os.path.exists(path):
                missing.append(f"{path} ({purpose})")
                continue
            err = schema_check(path)
            if err:
                bad.append(f"{path}: {err}")
        report[b] = {"expected": len(files),
                     "present": len(files) - len(missing),
                     "missing": missing, "schema_errors": bad}
        ok = ok and not missing and not bad
    print(json.dumps({"data_root": args.data_root, "ok": ok,
                      "baselines": report}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
