"""OC metric → SignalFx datapoint translation + memorymonitor source (P3/S7).

Reference:
  - memorymonitor scrape source emits Metric{descriptor, timeseries[point]}
    every interval (receiver/memorymonitor/monitor.go:48-115,171-203;
    descriptors metrics.go:29-134);
  - the signalfx translator explodes Metric → TimeSeries → Point and maps
    {CUMULATIVE_* → counter, GAUGE_* → gauge}, {*_DOUBLE → float value,
    *_INT64 → int value}, adding the constant dimension translator=otel
    (translator/metric/signalfx/opencensus_to_signalfx.go:28-88).

Spark-first: the scrape source is a deterministic `spark.range` generator
producing the NESTED shape (array of point structs per metric) so the
translator genuinely exercises explode; the translator is two explodes +
chained F.when — no UDFs (SURVEY.md §2.2 P3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, unit, oc_type) — a slice of the memorymonitor descriptor set
# (receiver/memorymonitor/metrics.go:29-134).
DESCRIPTORS = [
    ("memory_used", "By", "GAUGE_INT64"),
    ("memory_available", "By", "GAUGE_INT64"),
    ("swap_used", "By", "GAUGE_INT64"),
    ("cpu_seconds", "s", "CUMULATIVE_DOUBLE"),
    ("load_avg", "1", "GAUGE_DOUBLE"),
    ("page_faults", "1", "CUMULATIVE_INT64"),
]

N_METRICS = 60          # 10 scrape rounds × 6 descriptors
POINTS_PER_SERIES = 2


def memorymonitor_scrape(spark: SparkSession) -> DataFrame:
    """Deterministic nested metric batch: one row per Metric with an array
    of Point structs (the TimeSeries), pure function of the range id."""
    df = spark.range(0, N_METRICS)
    m = F.col("id")
    didx = m % len(DESCRIPTORS)
    name = F.element_at(
        F.array(*[F.lit(d[0]) for d in DESCRIPTORS]), (didx + 1).cast("int")
    )
    unit = F.element_at(
        F.array(*[F.lit(d[1]) for d in DESCRIPTORS]), (didx + 1).cast("int")
    )
    oc_type = F.element_at(
        F.array(*[F.lit(d[2]) for d in DESCRIPTORS]), (didx + 1).cast("int")
    )
    base_ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))

    def point(p: int):
        raw = (m * 37 + F.lit(p * 11)) % 1000
        return F.struct(
            (base_ts + F.make_interval(secs=(m * 10 + p).cast("int"))).alias("ts"),
            raw.cast("bigint").alias("raw"),
        )

    return df.select(
        name.alias("name"),
        unit.alias("unit"),
        oc_type.alias("oc_type"),
        F.concat(F.lit("h"), (m % 3).cast("string")).alias("host"),
        F.array(*[point(p) for p in range(POINTS_PER_SERIES)]).alias("points"),
    )


def to_signalfx(metrics: DataFrame) -> DataFrame:
    """Explode Metric → Point rows with SignalFx typing.

    Output: name, sf_type (counter|gauge), value (double; *_INT64 raw,
    *_DOUBLE raw/10.0), ts, translator ('otel'), host.
    """
    pts = metrics.select(
        "name", "oc_type", "host", F.explode("points").alias("pt")
    )
    sf_type = F.when(
        F.col("oc_type").startswith("CUMULATIVE"), "counter"
    ).otherwise("gauge")
    value = F.when(
        F.col("oc_type").endswith("DOUBLE"), F.col("pt.raw") / 10.0
    ).otherwise(F.col("pt.raw").cast("double"))
    return pts.select(
        "name",
        sf_type.alias("sf_type"),
        value.alias("value"),
        F.col("pt.ts").alias("ts"),
        F.lit("otel").alias("translator"),
        "host",
    )


# DuckDB oracle twin: the flat result computed directly from range
# arithmetic (id = metric*POINTS_PER_SERIES + point).
def signalfx_oracle_sql() -> str:
    names = ", ".join(f"'{d[0]}'" for d in DESCRIPTORS)
    types = ", ".join(f"'{d[2]}'" for d in DESCRIPTORS)
    n = len(DESCRIPTORS)
    total = N_METRICS * POINTS_PER_SERIES
    return f"""
WITH flat AS (
  SELECT CAST(i // {POINTS_PER_SERIES} AS BIGINT) AS m,
         CAST(i % {POINTS_PER_SERIES} AS BIGINT) AS p
  FROM range({total}) t(i)
), typed AS (
  SELECT m, p,
         ([{names}])[CAST(m % {n} AS INTEGER) + 1] AS name,
         ([{types}])[CAST(m % {n} AS INTEGER) + 1] AS oc_type,
         (m * 37 + p * 11) % 1000 AS raw
  FROM flat
)
SELECT name,
       CASE WHEN oc_type LIKE 'CUMULATIVE%' THEN 'counter' ELSE 'gauge' END AS sf_type,
       CASE WHEN oc_type LIKE '%DOUBLE' THEN raw / 10.0 ELSE CAST(raw AS DOUBLE) END AS value,
       TIMESTAMP '2024-01-01 00:00:00' + to_seconds(m * 10 + p) AS ts,
       'otel' AS translator,
       'h' || CAST(m % 3 AS VARCHAR) AS host
FROM typed
"""
