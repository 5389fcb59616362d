from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(col, scale: int = 2) -> Column:
    """Exact-decimal view of a currency-like double (see operators.__init__)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col, scale: int = 2) -> Column:
    """Order-independent sum: decimal-exact, emitted as rounded double."""
    return F.round(F.sum(dec(col, scale)).cast("double"), scale)


def davg(col, scale: int = 2, out_scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, rounded."""
    return F.round(F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1)), out_scale)


def round_stable(col: Column, scale: int) -> Column:
    """Cross-engine-stable double rounding. Exact terminating decimals can
    land precisely on a .xxx5 boundary, where Spark (BigDecimal HALF_UP on
    the binary value) and DuckDB (scaled std::round) disagree. A +1e-9
    nudge moves boundary values off the knife edge identically in both
    engines (mirror with ROUND(x + 1e-9, n) in oracle SQL)."""
    return F.round(col + F.lit(1e-9), scale)


def day(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def month(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")


def sorted_ids_pairs(ids: Column | str, n1: str, n2: str) -> Column:
    """All ordered pairs (a < b) from a SORTED id array, as an
    array<struct<n1, n2>> — ``F.explode(...)`` at the call site.

    Shared by every bucketed pair generator (posting lists, MinHash/
    SimHash bands, embedding-LSH buckets): pairs come from ONE
    collect_list shuffle instead of a self-join that materializes the
    banded table twice. The flattened pair array is QUADRATIC in
    len(ids) — every caller must cap (or split by) list size first;
    per-group memory is then bounded by cap²/2 structs."""
    ids = F.col(ids) if isinstance(ids, str) else ids
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias(n1), y.alias(n2)),
            ),
        )
    )
