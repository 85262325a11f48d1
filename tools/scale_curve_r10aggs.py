"""Scale curves for the r10 aggregate families the r10 verdict left
without a measured row (Missing #4): gini, equi-depth histogram,
chi-square keyness, frequent item pairs, and sequential motifs.

Paired like-work measurement, the house pattern (scale_curve_wmedian):
synthetic data written once to parquet, Spark runs the engine's exact
operator shape (grouped global_rank / map-side-combined aggregates /
basket-keyed self-join / per-key lead() windows — the same composition
the registered queries use, on the same shared lib where one exists),
DuckDB runs the registered oracle shape; results asserted identical
BEFORE timing counts anything; 3 runs each, warm = min of the
non-cold runs.

Usage: PYTHONPATH=. python tools/scale_curve_r10aggs.py <op> [n_rows]
  op ∈ {gini, equidepth, keyness, pairs, motifs}
One (op, size) per invocation; cool the box between sizes (r8 rule).
"""

import os
import sys
import time

OP = sys.argv[1] if len(sys.argv) > 1 else "gini"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
DATA = f"/tmp/scale_r10aggs_{OP}_{N}"

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from utils_infra_spark.session import get_spark  # noqa: E402

spark = get_spark(f"scale-curve-{OP}")
con = duckdb.connect()


def run_pair(spark_fn, duck_sql, check_fn, label):
    s_runs, d_runs = [], []
    st = dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        st = spark_fn()
        s_runs.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        dt = con.execute(duck_sql).arrow()
        d_runs.append(round(time.perf_counter() - t0, 2))
    check_fn(st, dt)
    sw, dw = min(s_runs[1:]), min(d_runs[1:])
    print(f"[{label}] n_rows={N}")
    print(f"[{label}] spark runs: {s_runs} warm: {sw}")
    print(f"[{label}] duck runs:  {d_runs} warm: {dw}")
    print(f"[{label}] spark/duck ratio: {round(sw / dw, 2)}")


def sorted_rows(tbl, cols):
    return sorted(zip(*[tbl.column(c).to_pylist() for c in cols]))


if OP in ("gini", "equidepth"):
    # 8 groups, wide integer-micro value domain, unique id tiebreak —
    # the grouped-global_rank regime (a plain per-group window would
    # funnel N/8 rows through one task)
    if not os.path.exists(DATA):
        spark.range(N).selectExpr(
            "CAST(id % 8 AS STRING) AS g",
            "CAST((id * 2654435761) % 99999989 AS BIGINT) AS v",
            "id",
        ).write.mode("overwrite").parquet(DATA)
    rows = spark.read.parquet(DATA)
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
    from utils_infra_spark.operators.ranking import global_rank

    if OP == "gini":

        def spark_fn():
            ranked = global_rank(rows, ["v", "id"], partition_cols=["g"], rank_col="rn")
            return (
                ranked.groupBy("g")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
                    F.sum((F.col("rn").cast("decimal(38,0)") * F.col("v"))).alias("srv"),
                )
                .selectExpr(
                    "g",
                    "CAST(n AS BIGINT) AS n",
                    "CASE WHEN sv > 0 AND n > 1 THEN "
                    "ROUND((2.0 * CAST(srv AS DOUBLE) - CAST((n + 1) * sv AS DOUBLE))"
                    " / CAST(n * sv AS DOUBLE), 6) END AS gini",
                )
                .toArrow()
            )

        DUCK = """
        WITH r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn FROM t),
             s AS (SELECT g, COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS sv,
                          SUM(CAST(rn AS HUGEINT) * v) AS srv FROM r GROUP BY g)
        SELECT g, CAST(n AS BIGINT) AS n,
               CASE WHEN sv > 0 AND n > 1 THEN
                 ROUND((2.0 * CAST(srv AS DOUBLE) - CAST((n + 1) * sv AS DOUBLE))
                       / CAST(n * sv AS DOUBLE), 6) END AS gini
        FROM s
        """

        def check(st, dt):
            assert sorted_rows(st, ["g", "n", "gini"]) == sorted_rows(dt, ["g", "n", "gini"])

        run_pair(spark_fn, DUCK, check, "gini")
    else:

        def spark_fn():
            ranked = global_rank(rows, ["v", "id"], partition_cols=["g"], rank_col="rn")
            totals = rows.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
            return (
                ranked.join(F.broadcast(totals), "g")
                .withColumn("tile", F.expr("((rn - 1) * 8) DIV n"))
                .groupBy("g", "tile")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.min("v").alias("lo"),
                    F.max("v").alias("hi"),
                )
                .toArrow()
            )

        DUCK = """
        WITH r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
                          COUNT(*) OVER (PARTITION BY g) AS n FROM t)
        SELECT g, ((rn - 1) * 8) // n AS tile, COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
        FROM r GROUP BY 1, 2
        """

        def check(st, dt):
            assert sorted_rows(st, ["g", "tile", "n_rows", "lo", "hi"]) == sorted_rows(
                dt, ["g", "tile", "n_rows", "lo", "hi"]
            )

        run_pair(spark_fn, DUCK, check, "equidepth")

elif OP == "keyness":
    # zipf-ish token stream split into two corpora: one map-side
    # combined token aggregate, a one-row totals broadcast, in-row
    # exact-integer chi2 (the token_keyness_chi2 shape)
    if not os.path.exists(DATA):
        spark.range(N).selectExpr(
            "CONCAT('tok', CAST((id * id + id) % 20011 AS STRING)) AS tok",
            "CAST(id % 2 AS INT) AS corpus",
        ).write.mode("overwrite").parquet(DATA)
    rows = spark.read.parquet(DATA)
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")

    def spark_fn():
        counts = rows.groupBy("tok").agg(
            F.sum(F.expr("CASE WHEN corpus = 0 THEN 1 ELSE 0 END")).alias("a"),
            F.sum(F.expr("CASE WHEN corpus = 1 THEN 1 ELSE 0 END")).alias("b"),
        )
        tot = counts.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
        return (
            counts.crossJoin(F.broadcast(tot))
            .selectExpr(
                "tok",
                "a",
                "b",
                "ROUND(((CAST(a AS DOUBLE) * tb - CAST(b AS DOUBLE) * ta)"
                " * (CAST(a AS DOUBLE) * tb - CAST(b AS DOUBLE) * ta))"
                " / (CAST(ta AS DOUBLE) * tb * (a + b) * (ta + tb - a - b)), 6) AS chi2",
            )
            .orderBy(F.desc("chi2"), "tok")
            .limit(50)
            .toArrow()
        )

    DUCK = """
    WITH c AS (SELECT tok,
                      SUM(CASE WHEN corpus = 0 THEN 1 ELSE 0 END) AS a,
                      SUM(CASE WHEN corpus = 1 THEN 1 ELSE 0 END) AS b
               FROM t GROUP BY tok),
         tt AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM c)
    SELECT tok, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           ROUND(((CAST(a AS DOUBLE) * tb - CAST(b AS DOUBLE) * ta)
                  * (CAST(a AS DOUBLE) * tb - CAST(b AS DOUBLE) * ta))
                 / (CAST(ta AS DOUBLE) * tb * (a + b) * (ta + tb - a - b)), 6) AS chi2
    FROM c, tt ORDER BY chi2 DESC, tok LIMIT 50
    """

    def check(st, dt):
        assert sorted_rows(st, ["tok", "a", "b", "chi2"]) == sorted_rows(
            dt, ["tok", "a", "b", "chi2"]
        )

    run_pair(spark_fn, DUCK, check, "keyness")

elif OP == "pairs":
    # N item rows over N/4 baskets (~4 items each), item domain zipf-ish
    # via squaring: the self-join is KEYED ON THE BASKET ID so per-reducer
    # work is basket-bounded, never item-popularity-bounded
    if not os.path.exists(DATA):
        spark.range(N).selectExpr(
            "CAST(id DIV 4 AS BIGINT) AS basket",
            "CAST((id * id + 17 * id) % 5003 AS BIGINT) AS item",
        ).dropDuplicates(["basket", "item"]).write.mode("overwrite").parquet(DATA)
    rows = spark.read.parquet(DATA)
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
    MIN_SUP = max(2, N // 20000)

    def spark_fn():
        sup = rows.groupBy("item").agg(F.count(F.lit(1)).alias("s")).where(f"s >= {MIN_SUP}")
        pruned = rows.join(F.broadcast(sup.select("item")), "item", "left_semi")
        a, b = pruned.alias("a"), pruned.alias("b")
        return (
            a.join(b, (F.col("a.basket") == F.col("b.basket")) & (F.col("a.item") < F.col("b.item")))
            .groupBy(F.col("a.item").alias("i1"), F.col("b.item").alias("i2"))
            .agg(F.count(F.lit(1)).alias("pair_sup"))
            .where(f"pair_sup >= {MIN_SUP}")
            .toArrow()
        )

    DUCK = f"""
    SELECT a.item AS i1, b.item AS i2, COUNT(*) AS pair_sup
    FROM t a JOIN t b ON a.basket = b.basket AND a.item < b.item
    GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUP}
    """

    def check(st, dt):
        assert sorted_rows(st, ["i1", "i2", "pair_sup"]) == sorted_rows(dt, ["i1", "i2", "pair_sup"])

    run_pair(spark_fn, DUCK, check, "pairs")

elif OP == "motifs":
    # N events over N/50 users: two lead() taps over ONE per-user sort,
    # map-side-combined motif counts, TakeOrdered top-50
    if not os.path.exists(DATA):
        spark.range(N).selectExpr(
            "CAST(id % (CAST({} AS BIGINT) DIV 50) AS BIGINT) AS user_id".format(N),
            "id AS seq",
            "CAST((id * 2654435761) % 7 AS STRING) AS ev",
        ).write.mode("overwrite").parquet(DATA)
    rows = spark.read.parquet(DATA)
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{DATA}/*.parquet')")
    from pyspark.sql import Window

    def spark_fn():
        w = Window.partitionBy("user_id").orderBy("seq")
        tri = rows.select(
            "ev",
            F.lead("ev", 1).over(w).alias("e2"),
            F.lead("ev", 2).over(w).alias("e3"),
        ).where("e2 IS NOT NULL AND e3 IS NOT NULL")
        return (
            tri.groupBy("ev", "e2", "e3")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "ev", "e2", "e3")
            .limit(50)
            .toArrow()
        )

    DUCK = """
    WITH s AS (SELECT user_id, ev,
                      lead(ev, 1) OVER (PARTITION BY user_id ORDER BY seq) AS e2,
                      lead(ev, 2) OVER (PARTITION BY user_id ORDER BY seq) AS e3
               FROM t)
    SELECT ev, e2, e3, COUNT(*) AS n FROM s
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY n DESC, ev, e2, e3 LIMIT 50
    """

    def check(st, dt):
        assert sorted_rows(st, ["ev", "e2", "e3", "n"]) == sorted_rows(dt, ["ev", "e2", "e3", "n"])

    run_pair(spark_fn, DUCK, check, "motifs")

else:
    raise SystemExit(f"unknown op {OP!r}; pick gini|equidepth|keyness|pairs|motifs")
