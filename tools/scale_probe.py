"""Scale probe — measure how the heavy operators behave when the driver
testdata is replicated N× (default 20×), as evidence for the "would this
plan survive 100×?" question the per-SF bench can't answer.

Replication is growth-shaped, not copy-shaped:
- events: each copy offsets event_id and user_id, so user cardinality
  grows with volume (per-user density constant — windows and band joins
  scale by users, the realistic axis).
- documents: each copy offsets doc_id and prefixes every token with a
  copy tag, so shingle spaces are disjoint across copies — corpus size
  grows with a CONSTANT near-dup rate instead of the quadratic cross-copy
  dup blowup naive replication would fabricate.

Each probed query runs twice (min taken) at 1× and at N× from parquet on
disk; the report prints time ratio vs the N× volume ratio. Ratios near N
(or below, where fixed overhead amortizes) mean linear scaling; ratios
well above N flag a super-linear stage.

Usage: python tools/scale_probe.py [--factor 20] [--sf /root/testdata/sf0.1]
Writes SCALE_PROBE.md at the repo root.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from youtube_scraper_db_spark.io import read_table  # noqa: E402
from youtube_scraper_db_spark.registry import REGISTRY  # noqa: E402
from youtube_scraper_db_spark.session import get_spark  # noqa: E402

EVENT_QUERIES = [
    "event_daily_rollup",
    "event_user_moving_avg",
    "event_value_delta",
    "event_neighbor_counts",
    "sessionized_events",
    "event_funnel",
    "daily_event_counts_dense",
]
DOC_QUERIES = [
    "doc_token_stats",
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "minhash_lsh_dups",
    "simhash_dups",
    "decontamination_flags",
    "near_dup_clusters",
]


def build_scaled(spark, sf_dir: str, factor: int) -> str:
    out = tempfile.mkdtemp(prefix=f"sg_scale_x{factor}_")
    ev = read_table(spark, sf_dir, "events")
    ev_max_id = ev.agg(F.max("event_id")).first()[0] + 1
    ev_max_user = ev.agg(F.max("user_id")).first()[0] + 1
    copies = []
    for i in range(factor):
        copies.append(
            ev.select(
                (F.col("event_id") + F.lit(i * ev_max_id)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * ev_max_user)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    scaled_ev = copies[0]
    for c in copies[1:]:
        scaled_ev = scaled_ev.unionAll(c)
    scaled_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    docs = read_table(spark, sf_dir, "documents")
    d_max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    dcopies = []
    for i in range(factor):
        dcopies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * d_max_id)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"c{i}$1").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    scaled_d = dcopies[0]
    for c in dcopies[1:]:
        scaled_d = scaled_d.unionAll(c)
    scaled_d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def time_query(spark, spec, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        t0 = time.time()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def time_all(sf_dir: str, names: list[str]) -> dict[str, float]:
    """Time the query set in a FRESH session (stopped afterwards): a long
    shared session accumulates block-manager/broadcast state from earlier
    queries that inflates later measurements — the first probe version
    measured a 2.5× phantom slowdown on the last query that a clean
    session could not reproduce. One session per data size, same query
    order, keeps the two sides comparable."""
    spark = get_spark("scale_probe")
    specs = {s.name: s for s in REGISTRY}
    out = {}
    # warmup: JIT/codegen/parquet-footer caches
    specs[names[0]].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    for name in names:
        out[name] = time_query(spark, specs[name], sf_dir)
        print(f"  {sf_dir}: {name} {out[name]}s", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("scale_probe")
    scaled_dir = build_scaled(spark, args.sf, args.factor)
    spark.stop()

    names = EVENT_QUERIES + DOC_QUERIES
    base = time_all(args.sf, names)
    scaled = time_all(scaled_dir, names)

    lines = [
        "# SCALE_PROBE — operator scaling at replicated volume",
        "",
        f"Driver testdata (`{args.sf}`) replicated ×{args.factor} "
        "(events: user cardinality grows with volume; documents: disjoint "
        "per-copy shingle spaces keep the near-dup rate constant). "
        "time(×N)/time(×1) ≈ N ⇒ linear; ≪ N ⇒ fixed overhead amortizing; "
        "≫ N ⇒ a super-linear stage to fix. One fresh session per data "
        "size, min of 2 runs per query. Generated by tools/scale_probe.py.",
        "",
        f"| query | t(×1) s | t(×{args.factor}) s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for name in names:
        t1, tn = base[name], scaled[name]
        ratio = round(tn / t1, 1) if t1 > 0 else float("inf")
        verdict = (
            "linear-or-better" if ratio <= args.factor * 1.25 else "SUPER-LINEAR"
        )
        lines.append(f"| {name} | {t1} | {tn} | {ratio}× | {verdict} |")
        print(lines[-1], flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE_PROBE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote SCALE_PROBE.md (scaled data in {scaled_dir})")


if __name__ == "__main__":
    main()
