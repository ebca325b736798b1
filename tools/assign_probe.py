"""A/B probe for clustering._assign (round 15, VERDICT #3).

Times, on a warm session over the sf0.1 embeddings table:

- literal:  the current form — k unrolled (zip_with + fold + hround)
  struct choices over k x d literal arrays, argmin via array_min;
- attached: the candidate form — the SAME per-element double math, but
  the centroid family shipped as DATA (one createDataFrame row holding
  array<struct<cluster int, cvec array<double>>>), attached to every row
  by a broadcast join and argmin'd with one transform + array_min.

For each form: fresh-tree construction+analysis time (df.schema), then
noop-sink execution time, repeated; plus a bit-exactness check (sorted
collect comparison of (vec_id, cluster, d)).

Usage: python tools/assign_probe.py [k] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from les_etl_pipeline_spark.functions.rounding import hround  # noqa: E402
from les_etl_pipeline_spark.operators import clustering  # noqa: E402
from les_etl_pipeline_spark.session import get_spark  # noqa: E402


def attached_assign(e, cents):
    spark = e.sparkSession
    rows = [([(int(c), [float(x) for x in cents[c]]) for c in sorted(cents)],)]
    cent_df = spark.createDataFrame(
        rows, "_cents array<struct<cluster: int, cvec: array<double>>>"
    )

    def choice(c):
        d = hround(
            F.aggregate(
                F.zip_with(F.col("v"), c["cvec"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        return F.struct(d.alias("d"), c["cluster"].alias("cluster"))

    best = F.array_min(F.transform(F.col("_cents"), choice))
    return (
        e.join(F.broadcast(cent_df))
        .select("vec_id", "v", best["cluster"].alias("cluster"), best["d"].alias("d"))
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("assign_probe")
    from les_etl_pipeline_spark.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.col("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    seeds = e.orderBy("vec_id").limit(k).collect()
    cents = {i: list(r.v) for i, r in enumerate(seeds)}

    forms = {
        "literal": lambda: clustering._assign(e, cents),
        "attached": lambda: attached_assign(e, cents),
    }
    # bit-exactness first
    rows = {}
    for name, fn in forms.items():
        rows[name] = sorted(
            (r.vec_id, r.cluster, repr(r.d)) for r in fn().select("vec_id", "cluster", "d").collect()
        )
    assert rows["literal"] == rows["attached"], "FORMS DISAGREE"
    print(f"bit-exact over {len(rows['literal'])} rows: OK")

    for name, fn in forms.items():
        fn().write.format("noop").mode("overwrite").save()  # warm
        an, ex = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn()
            df.schema  # force analysis
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            an.append(t1 - t0)
            ex.append(t2 - t1)
        an.sort(); ex.sort()
        print(
            f"{name}: analyze_med={an[len(an)//2]*1000:.1f}ms "
            f"exec_med={ex[len(ex)//2]*1000:.1f}ms"
        )
    spark.stop()


if __name__ == "__main__":
    main()
