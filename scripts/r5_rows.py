"""Render bench_r5/results.jsonl into BASELINE.md-style rows.

Computes the A/B percentages for the paired tags (share_warmup vs control,
overlay2 vs overlay0, w8a8-dual compositions) so the ledger rows are derived
from the recorded JSON, not hand-arithmetic.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/r5_rows.py
"""

import json
import os
import sys

PAIRS = [
    # (B tag, A tag, label)
    ("sd3_s4_share", "sd3_s4", "SD3 share_warmup s=4"),
    ("sd3_s8_share", "sd3_s8", "SD3 share_warmup s=8"),
    ("cascade_s4_share", "cascade_s4", "Cascade share_warmup s=4"),
    ("cascade_overlay2", "cascade_train", "Cascade overlay2 vs merged"),
    ("imgslider_sd1_ov2", "imgslider_sd1_ov0", "img-pair SD1 overlay2 vs merged"),
    ("imgslider_xl_ov2", "imgslider_xl_ov0", "img-pair XL overlay2 vs merged"),
    ("sd3_w8a8dual_s4_share", "sd3_w8a8dual_s4", "SD3 w8a8-dual: share s=4 vs no-share"),
    ("sd3_w8a8dual_s4_share", "sd3_s4_share", "SD3 share s=4: w8a8-dual vs bf16"),
    ("cascade_w8a8dual", "cascade_train", "Cascade w8a8-dual vs bf16 (s=1)"),
    ("cascade_w8a8dual_s4_share", "cascade_s4_share", "Cascade share s=4: w8a8-dual vs bf16"),
]


def main(path="bench_r5/results.jsonl"):
    rows = {}
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("QUEUE") or ln.startswith("ACCEPTANCE"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if d.get("result"):
            rows[d["tag"]] = d  # last write wins (retries supersede)

    print("== raw rows ==")
    for tag, d in rows.items():
        r = d["result"]
        if not isinstance(r, dict):
            continue
        extra = {k: v for k, v in r.items() if k not in ("metric", "value", "unit", "vs_baseline")}
        print(f"{tag:28s} {r.get('value'):>10} {r.get('unit','')}  vs_baseline={r.get('vs_baseline')}  {extra if extra else ''}")

    print("\n== A/B pairs ==")
    for b, a, label in PAIRS:
        if b in rows and a in rows:
            vb = rows[b]["result"]["value"]
            va = rows[a]["result"]["value"]
            print(f"{label:44s} {va:8.4f} -> {vb:8.4f}  ({(vb/va-1)*100:+.1f}%)")
        else:
            missing = [t for t in (a, b) if t not in rows]
            print(f"{label:44s} MISSING {missing}")


if __name__ == "__main__":
    main(*sys.argv[1:])
