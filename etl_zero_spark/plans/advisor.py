"""Join-strategy advisor: measurements -> a concrete physical plan
recommendation.

The repo carries every join lever a 100 TB estate needs — broadcast
(registry queries), salted shuffle (operators/joins.salted_join),
bucket-co-located zero-exchange (catalog.write_bucketed), plain
shuffle — plus the measurement operators that decide between them
(operators/stats.analyze, operators/aggregate.key_skew_report). This
module is the missing glue: run the measurements, apply the decision
rules an experienced Spark operator applies by hand, and return the
recommendation WITH its evidence, so "why did the pipeline salt this
join?" has an auditable answer.

Decision rules (in precedence order, thresholds as parameters):

1. either side's estimated bytes fit the broadcast budget
   -> ``broadcast`` (that side), no shuffle of the big side at all;
2. the probe side's key skew ratio exceeds the skew threshold
   -> ``salted`` with a salt factor sized from the hot key's share
   (one task otherwise owns max_count rows — AQE's skew split helps
   mid-query but cannot fix a single monster key's GC profile);
3. the join recurs (caller says so) and both sides are large
   -> ``bucketed``: pay each side's shuffle once at write time;
4. otherwise -> ``shuffle`` (sort-merge/shuffled-hash; Catalyst's
   default is already right).

Size estimation never counts rows with a second job: row counts come
from the caller or a fast ``df.count()`` the caller controls, bytes
from row count x average row width (analyze's avg_length for strings
+ fixed widths for atomics) — an ESTIMATE, labeled as such in the
evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

#: Fixed per-value widths (bytes, Tungsten-row ballpark) for atomics.
_WIDTHS = {
    BooleanType: 1,
    ByteType: 1,
    ShortType: 2,
    IntegerType: 4,
    FloatType: 4,
    LongType: 8,
    DoubleType: 8,
    DateType: 4,
    TimestampType: 8,
    TimestampNTZType: 8,
}


def estimate_bytes(df: DataFrame, n_rows: int | None = None) -> dict:
    """Rough in-memory size: rows x sum(column widths), string widths
    from one ``avg(length)`` pass. Returns {n_rows, est_row_bytes,
    est_total_bytes}."""
    if n_rows is None:
        n_rows = df.count()
    width = 0.0
    str_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    for f in df.schema.fields:
        w = _WIDTHS.get(type(f.dataType))
        width += w if w is not None else 16  # arrays/structs: floor guess
    if str_cols and n_rows > 0:
        row = df.agg(
            *[F.avg(F.length(c)).alias(c) for c in str_cols]
        ).first()
        width += sum((row[c] or 0.0) for c in str_cols)
    return {
        "n_rows": n_rows,
        "est_row_bytes": round(width, 1),
        "est_total_bytes": int(n_rows * width),
    }


@dataclass
class JoinAdvice:
    strategy: str  # broadcast | salted | bucketed | shuffle
    build_side: str | None  # for broadcast: 'left' | 'right'
    salt: int | None
    evidence: dict = field(default_factory=dict)


def advise_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    recurring: bool = False,
    broadcast_bytes: int = 256 * 1024 * 1024,
    skew_ratio_threshold: float = 8.0,
    shuffle_partitions: int | None = None,
) -> JoinAdvice:
    """Measure both sides and recommend the join strategy (see module
    docstring for the rules). Runs two size estimates and, when
    neither side broadcasts, one skew profile of the LARGER side (the
    side whose shuffle distribution decides task balance)."""
    keys = [on] if isinstance(on, str) else list(on)
    l_sz, r_sz = estimate_bytes(left), estimate_bytes(right)
    ev = {"left": l_sz, "right": r_sz, "estimates": "row-width model"}
    if min(l_sz["est_total_bytes"], r_sz["est_total_bytes"]) <= broadcast_bytes:
        side = "left" if l_sz["est_total_bytes"] <= r_sz["est_total_bytes"] else "right"
        return JoinAdvice("broadcast", side, None, ev)

    from etl_zero_spark.operators.aggregate import key_skew_report

    big = left if l_sz["est_total_bytes"] >= r_sz["est_total_bytes"] else right
    skew = key_skew_report(big, keys).first().asDict()
    skew.pop("top_keys", None)
    ev["skew"] = skew
    if skew["skew_ratio"] and skew["skew_ratio"] >= skew_ratio_threshold:
        parts = shuffle_partitions or int(
            big.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        # salt so the hot key's max_count splits to ~mean-sized slices
        mean = max(1.0, skew["n_rows"] / max(1, skew["n_keys"]))
        salt = int(min(parts, max(2, round(skew["max_count"] / mean))))
        return JoinAdvice("salted", None, salt, ev)
    if recurring:
        return JoinAdvice("bucketed", None, None, ev)
    return JoinAdvice("shuffle", None, None, ev)
