"""Isolated feats-materialization delta for curation v3 (r9, VERDICT
item 2): time corpus_curation_pipeline_v3 with `_doc_quality_feats`'s
localCheckpoint ON vs OFF in the SAME session, same box, interleaved
A/B/A/B so environment drift shows up as within-arm variance rather
than between-arm bias.

Run: PYTHONPATH=/root/repo python tools/scale_probe_v3_materialize.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "4"))


def _steal0():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]), sum(int(x) for x in parts[1:])


def main() -> None:
    import financial_data_science_spark.queries as QQ
    from financial_data_science_spark import get_spark

    spark = get_spark("probe_v3_materialize")
    orig = QQ._doc_quality_feats

    def timed(materialize: bool) -> float:
        QQ._doc_quality_feats = (
            orig
            if materialize
            else (lambda docs, materialize=False: orig(docs, False))
        )
        try:
            t0 = time.time()
            n = QQ.Q["corpus_curation_pipeline_v3"](spark, SF_DIR).count()
            return time.time() - t0, n
        finally:
            QQ._doc_quality_feats = orig

    s0, t0 = _steal0()
    on, off = [], []
    rows = set()
    for _ in range(ROUNDS):
        w, n = timed(True); on.append(round(w, 3)); rows.add(n)
        w, n = timed(False); off.append(round(w, 3)); rows.add(n)
    s1, t1 = _steal0()
    assert len(rows) == 1, rows  # toggle must not change the result
    print(f"materialize=True : {on}  (min {min(on):.2f}s)")
    print(f"materialize=False: {off}  (min {min(off):.2f}s)")
    print(f"isolated delta (min-vs-min): {min(off) - min(on):+.2f}s "
          f"({min(off)/min(on):.2f}x); rows={rows.pop()}")
    print(f"steal over probe: {100.0 * (s1 - s0) / max(t1 - t0, 1):.2f}%")
    spark.stop()


if __name__ == "__main__":
    main()
