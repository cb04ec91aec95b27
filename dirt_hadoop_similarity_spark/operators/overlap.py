"""Overlap + final Lin similarity: Jobs 3 and 4 as one join pipeline.

    sim_slot(p1, p2) = Σ_{f ∈ V1∩V2} (mi1(f) + mi2(f)) / (ΣMI(p1,slot) + ΣMI(p2,slot))
    score(p1, p2)    = sqrt(sim_X · sim_Y)

Reference semantics preserved exactly (DirtDriver.java:736-978):

  * pair universe comes from the test set, canonicalized p1 <= p2
    (DirtDriver.java:861-862);
  * a pair is EMITTED (even with score 0.0) iff at least one member path
    has MI features — that is what creates a Job-3 reduce group; pairs
    where neither path survived MI are absent from the output, and pairs
    with no overlap appear with 0.0 (visible in the shipped goldens);
  * degenerate p1 == p2 pairs score 0.0: the reference routes all rows
    into v1 and leaves v2 empty (DirtDriver.java:890-893);
  * zero denominators guard to 0.0 (DirtDriver.java:972-973).

Spark shape: the Job-3 broadcast fan-out becomes ONE broadcast join of
the MI table against the (tiny) pair-membership table, each fanned row
tagged with the vector side it fills; the feature intersection is then
a keyed aggregation, not a self-join.  The big MI relation is scanned
once and crosses one exchange — an explicit (p1, p2) repartition that
the side-collapse aggregate, the numerator aggregate and the emit-zero
distinct all reuse (guide §2.4; the former shape scanned MI three times
and exchanged the fan-out twice more for the self-join's two sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators.mi import sum_mi_pivoted


def canonical_pairs(pairs_df: DataFrame) -> DataFrame:
    """P9: canonicalize and dedupe to ``(p1, p2)`` with p1 <= p2.

    Duplicate test-set pairs collapse — the reference's HashMap ``v1.put``
    overwrite makes duplicates a no-op there too."""
    return (
        pairs_df.select(
            F.least("p1", "p2").alias("p1"), F.greatest("p1", "p2").alias("p2")
        )
        .filter(F.col("p1").isNotNull() & F.col("p2").isNotNull())
        .distinct()
    )


def pair_members(pairs_df: DataFrame) -> DataFrame:
    """Explode pairs to ``(p1, p2, path)`` membership rows (one per side;
    a self-pair contributes a single row)."""
    return pairs_df.select(
        "p1", "p2", F.explode(F.array_distinct(F.array("p1", "p2"))).alias("path")
    )


def similarities(
    mi_df: DataFrame,
    pairs_df: DataFrame,
    sum_mi_df: DataFrame,
) -> DataFrame:
    """J3+J4+A5+A6+J5+F7+F8 → ``sims(p1, p2, score)``.

    ``pairs_df``: raw (p1, p2) path pairs (any orientation, with dupes);
    ``sum_mi_df``: output of :func:`mi.sum_mi`.
    """
    pairs = canonical_pairs(pairs_df)
    members = F.broadcast(pair_members(pairs))

    # J3: keep only MI rows belonging to some pair, fanned out per pair
    # and TAGGED with the vector side each row fills — ONE scan of the
    # MI relation (the former a/b role split scanned it twice, and the
    # emit-zero universe a third time).  The v1/v2 split that zeroes
    # self-pairs is preserved: a p1 == p2 row lands in mi1 only (the
    # reference routes all rows into v1, DirtDriver.java:890-893), so no
    # intersection survives for it.
    fanned = mi_df.join(members, "path", "inner")
    tagged = fanned.select(
        "p1", "p2", "slot", "word",
        F.when(F.col("path") == F.col("p1"), F.col("mi")).alias("mi1"),
        F.when(
            (F.col("path") == F.col("p2")) & (F.col("p1") != F.col("p2")),
            F.col("mi"),
        ).alias("mi2"),
    ).repartition("p1", "p2")

    # J4/A5: feature intersection as ONE keyed aggregation over the
    # shared (p1, p2) clustering instead of a self-equi-join of two
    # role-filtered scans.  The explicit repartition establishes the
    # partitioning ONCE and all three keyed consumers — the
    # (p1,p2,slot,word) side-collapse, the (p1,p2) numerator aggregate,
    # and the emit-zero distinct — reuse it exchange-free (guide §2.4:
    # operations keyed the same way share one exchange; subset
    # clustering satisfies each wider grouping).  mi is unique per
    # (path, slot, word), so each group holds at most one row per side
    # and max() is exact selection, not float combining; a feature is
    # in the intersection iff both sides are present, and the numerator
    # terms (mi1 + mi2 summed per pair/slot) are the identical doubles
    # the join produced.
    grouped = tagged.groupBy("p1", "p2", "slot", "word").agg(
        F.max("mi1").alias("mi1"), F.max("mi2").alias("mi2")
    )
    nums = (
        grouped.filter(F.col("mi1").isNotNull() & F.col("mi2").isNotNull())
        .groupBy("p1", "p2")
        .agg(
            F.sum(F.when(F.col("slot") == "X", F.col("mi1") + F.col("mi2"))).alias("num_x"),
            F.sum(F.when(F.col("slot") == "Y", F.col("mi1") + F.col("mi2"))).alias("num_y"),
        )
    )

    # Emit-zero universe: pairs where >=1 member path has MI features —
    # the distinct of the SAME tagged relation, exchange-free on the
    # shared partitioning (every tagged row carries a side by
    # construction, so this is exactly the former mi ⋈ members
    # projection).
    emitted = tagged.select("p1", "p2").distinct()

    # J5: denominators from the pivoted ΣMI table, one lookup per side.
    denoms = sum_mi_pivoted(sum_mi_df)
    d1 = denoms.select(
        F.col("path").alias("p1"),
        F.col("sum_mi_x").alias("s1x"),
        F.col("sum_mi_y").alias("s1y"),
    )
    d2 = denoms.select(
        F.col("path").alias("p2"),
        F.col("sum_mi_x").alias("s2x"),
        F.col("sum_mi_y").alias("s2y"),
    )

    scored = (
        emitted.join(nums, ["p1", "p2"], "left")
        .join(d1, "p1", "left")
        .join(d2, "p2", "left")
        .select(
            "p1",
            "p2",
            *[
                F.coalesce(c, F.lit(0.0)).alias(c)
                for c in ("num_x", "num_y", "s1x", "s1y", "s2x", "s2y")
            ],
        )
    )
    sim_x = F.when(
        F.col("s1x") + F.col("s2x") > 0, F.col("num_x") / (F.col("s1x") + F.col("s2x"))
    ).otherwise(0.0)
    sim_y = F.when(
        F.col("s1y") + F.col("s2y") > 0, F.col("num_y") / (F.col("s1y") + F.col("s2y"))
    ).otherwise(0.0)
    return scored.select(
        "p1", "p2", F.sqrt(sim_x * sim_y).alias("score")
    )
