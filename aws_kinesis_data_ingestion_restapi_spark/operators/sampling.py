"""Deterministic hash sampling for corpus curation.

Training-data pipelines mix sources/languages at controlled rates
(e.g. up-sample high-quality English, down-sample boilerplate-heavy
strata). ``sample()`` here is NOT Spark's ``DataFrame.sample`` —
that draws from a per-partition RNG, so results change with
partitioning, retries and cluster size. Hash sampling keys the
keep/drop decision on a stable row id: the same corpus yields the
same sample on any cluster, any partition layout, any engine — which
is also what makes it oracle-checkable and makes reruns reproducible
for ablations.

Scale: the decision is one md5 + modulus per row, map-side, no
shuffle; rate changes recut the sample without moving data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5 hex chars used for the bucket hash (28 bits — uniform, and the
#: same prefix-int trick the dedup operators use, exact in int64).
_HEX = 7


def hash_bucket(id_col: Column | str = "doc_id", buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, buckets) from a row id: first 7 md5
    hex chars of the id's string form, as int, mod buckets."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX), 16, 10).cast("long")
    return (h % buckets).alias("bucket")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    percentage rate (``rates['en'] = 50`` keeps ~50% of English docs,
    exactly reproducibly). Strata missing from ``rates`` fall back to
    ``default_rate`` (0 = drop)."""
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return docs.filter(hash_bucket(id_col) < rate)


def quality_weighted_sample(
    scored: DataFrame,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Importance sampling for corpus curation: keep each row with
    probability equal to its quality score in [0, 1] — high-quality
    documents survive almost surely, boilerplate mostly drops, and the
    expected quality of the sample rises without a hard cutoff's cliff
    (the soft alternative to curation_pipeline's QUALITY_FLOOR).

    Deterministic like everything in this module: the uniform draw is
    the stable 28-bit id hash mod ``resolution`` compared against
    ``score × resolution`` — same sample on any cluster/partition
    layout/engine. (2^28 is not an exact multiple of the resolution, so
    the top of the range carries a ~0.3% bias — irrelevant for curation
    and identical in both engines.) Map-side filter, no shuffle."""
    c = F.col(id_col).cast("string")
    h = F.conv(F.substring(F.md5(c), 1, _HEX), 16, 10).cast("long")
    return scored.filter((h % resolution) < F.col(score_col) * resolution)
