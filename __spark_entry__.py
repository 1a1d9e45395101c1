"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship extraction over pages synthesized from the
sf0.001 documents table. `queries()` exposes one entry per implemented
operator family from SURVEY.md §2 plus the training-data ops (dedup /
similarity / text analysis / multimodal); `oracle_sql()` gives the DuckDB
twin for every SQL-expressible one (rows-only entries are the genuinely
non-SQL ops: layout geometry, MinHash/SimHash/LSH hashing, stub decode).

Conventions that keep the driver's hash-compare honest:
- every computed column is aliased identically on both sides;
- doubles are rounded in-query on both sides;
- timestamps are formatted to strings in-query on both sides;
- DuckDB embedding lists are cast ::DOUBLE[] so cosine math matches
  Spark's double-precision zip_with/aggregate exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# paddle_spark must be importable wherever the driver loads this module from
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


# Fact tables we fan out when the fixture arrives as one single-row-group
# file (a local-fixture artifact: one file = one scan partition = one task).
# At real scale these tables are many files and the scan parallelizes
# natively — the repartition below is a no-op guard, not a design shuffle.
_FAN_OUT = {"documents", "embeddings", "events", "lineitem", "orders"}

# Deterministic high-cardinality key per fact table: the fan-out guard
# hash-partitions on it instead of round-robin. Round-robin repartition
# pays a local sort of its whole input before assigning rows
# (spark.sql.execution.sortBeforeRepartition, guide §2.5) — on a
# single-split scan that sort is serial; a hash exchange on the PK is
# not, and it is retry-deterministic by construction.
_FAN_KEY = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}

# parquet footer metadata per fixture path (driver-side, cached: counting
# row groups costs one footer read)
_ROW_GROUPS: dict[str, int] = {}


def _scan_row_groups(path: str) -> int:
    """Total parquet row groups under a local fixture path (0 = unknown).
    The row group is parquet's split unit: a single-file fixture with one
    row group can never scan in parallel, while one with >= N row groups
    scans N-way once spark.sql.files.minPartitionNum shrinks the split
    size (paddle_spark.plans.build_session sets that floor)."""
    if path not in _ROW_GROUPS:
        n = 0
        try:
            import pyarrow.parquet as pq

            local = path[5:] if path.startswith("file:") else path
            if os.path.isdir(local):
                for f in os.listdir(local):
                    if f.endswith(".parquet"):
                        n += pq.ParquetFile(
                            os.path.join(local, f)
                        ).metadata.num_row_groups
            elif os.path.exists(local):
                n = pq.ParquetFile(local).metadata.num_row_groups
        except Exception:
            n = 0
        _ROW_GROUPS[path] = n
    return _ROW_GROUPS[path]


def _t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str | None = None,
    fan_out: bool = True,
) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not fan_out:
        # Reducing-aggregation consumers (groupBy with sum/count/min/max,
        # optionally behind a broadcast join): partial aggregation runs
        # INSIDE the scan stage and ships only collapsed agg state, so a
        # pre-shuffle of full rows moves bytes the aggregate was about to
        # collapse anyway (guide §2.3 "aggregate before you shuffle").
        # On a single-row-group fixture the scan is serial either way —
        # the repartition's map side IS that serial scan task, plus it
        # pays per-row partitioning/serialization the in-task agg update
        # doesn't. Measured 2-3x on time_buckets at sf0.1 AND the 10x
        # replica; results identity-checked (and the driver oracle pins
        # them). Window / per-row-kernel consumers keep the fan-out.
        return df
    if name in _FAN_OUT:
        # One input file ≈ one row group ≈ one scan partition for these
        # small fixtures; fan out so per-row-heavy queries parallelize.
        # (inputFiles, not df.rdd.getNumPartitions — stay off the RDD API.)
        p = spark.sparkContext.defaultParallelism
        if _scan_row_groups(path) >= max(2, p // 8):
            # enough row groups: the scan itself parallelizes (split-size
            # floor in build_session) and map-side partial aggregation
            # runs in the scan stage — no shuffle at all (guide §2.4)
            return df
        if len(df.inputFiles()) < max(2, p // 4):
            # ``key`` lets a caller align the fan-out with its downstream
            # window/groupBy key so both share ONE exchange (guide §2.4);
            # default is the table PK (hash, not round-robin: see _FAN_KEY)
            df = df.repartition(p, F.col(key or _FAN_KEY[name]))
    return df


# ---------------------------------------------------------------------------
# flagship: HTML extraction with an exact SQL oracle
# ---------------------------------------------------------------------------

_PAGE_PREFIX = (
    '<html><head><title>t</title></head><body>'
    '<header><nav><a href="/h">home</a> <a href="/a">about</a></nav></header>'
    "<article><h1>Heading "
)
_PAGE_MID = "</h1><p>"
_PAGE_SUFFIX = (
    '</p></article><footer><a href="/c">contact</a> legal terms</footer>'
    "</body></html>"
)


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Common-Crawl-shaped pages derived from `documents`:
    the template plants nav/footer boilerplate around the doc text, so the
    expected extraction is exactly 'Heading {id}\\n{text}' — SQL-expressible,
    which turns the byte-identity invariant into a DuckDB-checkable oracle."""
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(_PAGE_PREFIX),
        F.col("doc_id").cast("string"),
        F.lit(_PAGE_MID),
        F.col("text"),
        F.lit(_PAGE_SUFFIX),
    )
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.operators.extract_job import extract_pages

    pages = _pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, n_partitions=8)
    return out.select(
        "url", "text", "text_sha256", "n_blocks_kept", "n_blocks_dropped",
        "parse_ok", "branch",
    )


_EXTRACT_HTML_ORACLE = """
SELECT 'doc://' || doc_id AS url,
       'Heading ' || doc_id || chr(10) || text AS text,
       sha256('Heading ' || doc_id || chr(10) || text) AS text_sha256,
       CAST(2 AS INTEGER) AS n_blocks_kept,
       CAST(3 AS INTEGER) AS n_blocks_dropped,
       TRUE AS parse_ok,
       'html' AS branch
FROM documents
"""


_EXTRACT_BLOCKS_ORACLE = """
SELECT 'doc://' || doc_id AS url, CAST(0 AS INTEGER) AS page_no,
       CAST(b.block_id AS INTEGER) AS block_id, 'html' AS branch, b.label,
       CASE b.block_id WHEN 2 THEN 'Heading ' || doc_id
                       WHEN 3 THEN d.text ELSE '' END AS text,
       b.kept, b.drop_reason
FROM documents d
CROSS JOIN (VALUES
  (0, 'head',   FALSE, 'drop_region'),
  (1, 'header', FALSE, 'drop_region'),
  (2, 'h1',     TRUE,  NULL),
  (3, 'p',      TRUE,  NULL),
  (4, 'footer', FALSE, 'drop_region')
) AS b(block_id, label, kept, drop_reason)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract_html(spark, SF0001)


def q_extract_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout branch over synthetic detector-box PDFs derived from doc ids.
    Rows-only on THIS arbitrary fixture (box layouts are pseudo-random);
    the same chain is hash-green on closed-form inputs via its exact
    twins extract_layout_oracle / extract_layout_markdown / extract_real_pdf,
    and pinned by the pytest golden/property suites."""
    import pandas as pd

    from paddle_spark.operators.extract_job import extract_pages
    from paddle_spark.sources.synth import make_pdf, _rng

    docs = _t(spark, sf_dir, "documents").select("doc_id").limit(50)

    def to_pdf(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [f"pdf://{i}" for i in ids],
                    "warc_ts": pd.Series([None] * len(ids), dtype="datetime64[us]"),
                    "html": [make_pdf(_rng(42, int(i)), int(i)) for i in ids],
                    "text": pd.Series([None] * len(ids), dtype="object"),
                    "lang": ["en"] * len(ids),
                }
            )

    pages = docs.mapInPandas(
        to_pdf,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_pages(pages, n_partitions=4)
    return out.select(
        "url", "text_sha256", "n_blocks_kept", "n_blocks_dropped", "parse_ok", "branch"
    )


def q_extract_layout_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The geometry chain with an EXACT oracle: closed-form box fixtures
    (sources/synth.py make_oracle_pdf) where per-class threshold (F2), NMS
    (D1), merge (D2), label drop (F6), line grouping (W2), two-column
    reading order (W1) and page-separator assembly (A2) each have a
    predictable effect, so the expected text is a SQL string literal.
    Reference semantics: pipeline_config.yaml:84-127, model.py:311-316,
    testScript.py:138-150."""
    import pandas as pd

    from paddle_spark.operators.extract_job import extract_pages
    from paddle_spark.sources.synth import make_oracle_pdf

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_pdf(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [f"pdf-oracle://{i}" for i in ids],
                    "warc_ts": pd.Series([None] * len(ids), dtype="datetime64[us]"),
                    "html": [make_oracle_pdf(int(i)) for i in ids],
                    "text": pd.Series([None] * len(ids), dtype="object"),
                    "lang": ["en"] * len(ids),
                }
            )

    pages = docs.mapInPandas(
        to_pdf,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_pages(pages, n_partitions=4)
    return out.select(
        "url", "text", "n_blocks_kept", "n_blocks_dropped", "parse_ok", "branch"
    )


def q_extract_layout_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/A2 markdown assembly variant (testScript.py:156-161: '# Page n'
    headers, '---' separators, titles as '## ...' headings) over the same
    closed-form fixture — exact oracle."""
    import pandas as pd

    from paddle_spark.kernels.extract import sha256_text
    from paddle_spark.kernels.layout import extract_layout
    from paddle_spark.sources.synth import make_oracle_pdf

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_md(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            texts = [
                extract_layout(make_oracle_pdf(i), markdown=True)[0] for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "md": texts})

    return docs.mapInPandas(to_md, schema="doc_id long, md string")


_EXTRACT_LAYOUT_MD_ORACLE = """
SELECT doc_id,
  '# Page 1' || chr(10) || chr(10) ||
  '## Title ' || doc_id || chr(10) || chr(10) ||
  'Left ' || doc_id || chr(10) ||
  'Right ' || doc_id || chr(10) || chr(10) || chr(10) ||
  '---' || chr(10) || '# Page 2' || chr(10) || chr(10) ||
  'hello world ' || doc_id || chr(10) ||
  'Abs ' || doc_id || chr(10) AS md
FROM documents WHERE doc_id < 100
"""


_EXTRACT_LAYOUT_ORACLE = """
SELECT 'pdf-oracle://' || doc_id AS url,
  '=== PAGE 1 ===' || chr(10) || chr(10) ||
  'Title ' || doc_id || chr(10) ||
  'Left ' || doc_id || chr(10) ||
  'Right ' || doc_id || chr(10) || chr(10) || chr(10) ||
  '=== PAGE 2 ===' || chr(10) || chr(10) ||
  'hello world ' || doc_id || chr(10) ||
  'Abs ' || doc_id || chr(10) AS text,
  5 AS n_blocks_kept, 3 AS n_blocks_dropped,
  TRUE AS parse_ok, 'layout' AS branch
FROM documents WHERE doc_id < 100
"""


def q_extract_real_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT oracle through the REAL born-digital PDF parser
    (kernels/pdf.py): make_real_pdf (sources/synth.py) renders valid
    xref'd PDF 1.4 payloads — catalog -> page tree -> content streams with
    Tf/TL/Td/T*/Tj operators, FlateDecode on odd doc_ids — whose text
    layer is closed-form in doc_id, so the full object-scan -> stream
    decode -> operator replay -> line grouping -> reading order -> page
    assembly chain is pinned to a SQL string literal. This is the
    driver-green twin of the pytest make_real_pdf suite; reference
    semantics: model.py:300-337 (per-page parse -> ordered text)."""
    import pandas as pd

    from paddle_spark.operators.extract_job import extract_pages
    from paddle_spark.sources.synth import make_real_pdf

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_pdf(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = [
                make_real_pdf(
                    [
                        [f"Real pdf line one for doc {i}.",
                         f"Line two: value {7 * i}."],
                        [f"Closing page for doc {i}."],
                    ],
                    compress=bool(i % 2),  # odd ids exercise FlateDecode
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "url": [f"real-pdf://{i}" for i in ids],
                    "warc_ts": pd.Series([None] * len(ids), dtype="datetime64[us]"),
                    "html": payloads,
                    "text": pd.Series([None] * len(ids), dtype="object"),
                    "lang": ["en"] * len(ids),
                }
            )

    pages = docs.mapInPandas(
        to_pdf,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_pages(pages, n_partitions=4)
    return out.select(
        "url", "text", "n_blocks_kept", "n_blocks_dropped", "parse_ok", "branch"
    )


_EXTRACT_REAL_PDF_ORACLE = """
SELECT 'real-pdf://' || doc_id AS url,
  '=== PAGE 1 ===' || chr(10) || chr(10) ||
  'Real pdf line one for doc ' || doc_id || '.' || chr(10) ||
  'Line two: value ' || (7 * doc_id) || '.' || chr(10) || chr(10) || chr(10) ||
  '=== PAGE 2 ===' || chr(10) || chr(10) ||
  'Closing page for doc ' || doc_id || '.' || chr(10) AS text,
  3 AS n_blocks_kept, 0 AS n_blocks_dropped,
  TRUE AS parse_ok, 'layout' AS branch
FROM documents WHERE doc_id < 100
"""


# ---------------------------------------------------------------------------
# S2: payload classification
# ---------------------------------------------------------------------------

def q_extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic block fan-out (U5: 1 doc -> N block rows). The template
    pages produce exactly 5 blocks per doc (head/header/h1/p/footer), so
    even the fan-out has an exact SQL oracle."""
    from paddle_spark.operators.blocks import extract_blocks

    pages = _pages_from_documents(spark, sf_dir)
    return extract_blocks(pages, n_partitions=8).select(
        "url", "page_no", "block_id", "branch", "label", "text", "kept",
        "drop_reason",
    )


def q_classify_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.functions import payload_kind_col

    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("<html>"), F.col("text")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("%PDF-1.4 "), F.col("text")))
        .otherwise(F.col("text")),
        "utf-8",
    )
    return (
        docs.select(payload_kind_col(payload).alias("kind"))
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n"))
    )


_CLASSIFY_ORACLE = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'html'
            WHEN doc_id % 3 = 1 THEN 'pdf'
            ELSE 'garbage' END AS kind,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# filters (F3/F5/F6/F10)
# ---------------------------------------------------------------------------

def q_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("value") >= 90.0).select(
        "event_id", "event_type", F.round("value", 4).alias("value_r")
    )


_SCORE_FILTER_ORACLE = """
SELECT event_id, event_type, round(value, 4) AS value_r
FROM events WHERE value >= 90.0
"""


def q_min_size_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F5 analog: min width/height/area gating (caption_config.yaml:9-11)
    p = _t(spark, sf_dir, "part")
    w = F.col("p_size") * 3
    h = F.col("p_size") * 2
    return p.filter((w >= 60) & (h >= 40) & (w * h >= 4000)).select(
        "p_partkey", "p_name", (w * h).cast("long").alias("area")
    )


_MIN_SIZE_ORACLE = """
SELECT p_partkey, p_name, CAST((p_size*3)*(p_size*2) AS BIGINT) AS area
FROM part
WHERE p_size*3 >= 60 AND p_size*2 >= 40 AND (p_size*3)*(p_size*2) >= 4000
"""


def q_label_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


_LABEL_FILTER_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
"""


def q_stale_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F10 analog: TTL-drop entries older than (max ts - 7 days)
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") > F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_fresh"))
    )


_STALE_FILTER_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_fresh
FROM events
WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# joins (J1/J2/J3/J4/J5)
# ---------------------------------------------------------------------------

def q_computed_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analog: equi-join on a *computed* string key (the reference joins
    on 'x1_y1_x2_y2' keys built from bbox floats; here the key is built
    from the order's custkey)."""
    c = _t(spark, sf_dir, "customer")
    # keeps the fan-out: the probe side pays a per-row format_string +
    # broadcast hash probe BEFORE the reducing agg — serializing that
    # into the scan task measured 2x slower than shuffling it wide
    # (unlike the pure-sum consumers that pass fan_out=False)
    o = _t(spark, sf_dir, "orders")
    keyed = o.withColumn(
        "cust_key_str", F.format_string("Customer#%09d", F.col("o_custkey"))
    )
    return (
        keyed.join(F.broadcast(c), keyed.cust_key_str == c.c_name)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


_COMPUTED_KEY_JOIN_ORACLE = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer
  ON 'Customer#' || lpad(CAST(o_custkey AS VARCHAR), 9, '0') = c_name
GROUP BY 1
"""


def q_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 analog: left join + coalesce('') for unmatched probes."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("t"), F.count("*").alias("n")
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.round(F.coalesce(F.col("t"), F.lit(0.0)), 2).alias("total_spent"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
    )


_LEFT_JOIN_ORACLE = """
SELECT c_custkey,
       round(coalesce(t, 0.0), 2) AS total_spent,
       CAST(coalesce(n, 0) AS BIGINT) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, sum(o_totalprice) AS t, count(*) AS n
  FROM orders GROUP BY 1
) o ON c_custkey = o_custkey
"""


def _part_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic boxes derived from `part` — lets the
    geometric theta-joins (J3/J4) run against a SQL oracle."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    x1 = (F.col("p_partkey") * 37 % 500).cast("double")
    y1 = (F.col("p_partkey") * 59 % 700).cast("double")
    return p.select(
        F.col("p_partkey").alias("box_id"),
        x1.alias("x1"),
        y1.alias("y1"),
        (x1 + 40 + F.col("p_size") % 60).alias("x2"),
        (y1 + 30 + F.col("p_size") % 40).alias("y2"),
    )


_BOXES_CTE = """
WITH boxes AS (
  SELECT p_partkey AS box_id,
         CAST(p_partkey * 37 % 500 AS DOUBLE) AS x1,
         CAST(p_partkey * 59 % 700 AS DOUBLE) AS y1,
         CAST(p_partkey * 37 % 500 + 40 + p_size % 60 AS DOUBLE) AS x2,
         CAST(p_partkey * 59 % 700 + 30 + p_size % 40 AS DOUBLE) AS y2
  FROM part WHERE p_partkey < 200
)
"""


def q_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: 'overlap or nearby' theta-join with 10% margin
    (bbox_text_matcher.py:40-68 semantics)."""
    from paddle_spark.functions import boxes_overlap_cond

    boxes = _part_boxes(spark, sf_dir)
    a = boxes.alias("a")
    b = boxes.alias("b")
    return (
        a.join(
            b,
            (F.col("a.box_id") < F.col("b.box_id"))
            & boxes_overlap_cond("a", "b", 0.1),
        )
        .select(F.col("a.box_id").alias("a"), F.col("b.box_id").alias("b"))
    )


_OVERLAP_JOIN_ORACLE = _BOXES_CTE + """
SELECT a.box_id AS a, b.box_id AS b
FROM boxes a JOIN boxes b ON a.box_id < b.box_id
WHERE NOT (
     a.x2 + greatest(a.x2-a.x1, b.x2-b.x1)*0.1 < b.x1
  OR a.x1 - greatest(a.x2-a.x1, b.x2-b.x1)*0.1 > b.x2
  OR a.y2 + greatest(a.y2-a.y1, b.y2-b.y1)*0.1 < b.y1
  OR a.y1 - greatest(a.y2-a.y1, b.y2-b.y1)*0.1 > b.y2)
"""


def q_overlap_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 at scale: grid-cell candidate equi-join + exact overlap filter —
    output identical to the theta join (same oracle), plan is a hash join
    on (cx, cy) instead of a BroadcastNestedLoopJoin."""
    from paddle_spark.operators.spatial import bucketed_overlap_join

    return bucketed_overlap_join(_part_boxes(spark, sf_dir), cell=300.0)


def q_above_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: 'text directly above image' directional theta-join
    (bbox_text_matcher.py:70-83 semantics)."""
    from paddle_spark.functions import above_cond

    boxes = _part_boxes(spark, sf_dir)
    t = boxes.alias("t")
    i = boxes.alias("i")
    return (
        t.join(
            i,
            (F.col("t.box_id") != F.col("i.box_id")) & above_cond("t", "i", 100.0),
        )
        .select(F.col("t.box_id").alias("text_box"), F.col("i.box_id").alias("img_box"))
    )


_ABOVE_JOIN_ORACLE = _BOXES_CTE + """
SELECT t.box_id AS text_box, i.box_id AS img_box
FROM boxes t JOIN boxes i ON t.box_id != i.box_id
WHERE t.y2 <= i.y1 AND (i.y1 - t.y2) <= 100
  AND NOT (t.x2 < i.x1 OR t.x1 > i.x2)
"""


def q_above_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 at scale: reach-strip/top-edge grid candidates + exact predicate
    — identical output to the theta join (same oracle), hash-join plan.
    Self-pairs need no explicit exclusion: a box is never above itself."""
    from paddle_spark.operators.spatial import bucketed_above_join

    boxes = _part_boxes(spark, sf_dir)
    out = bucketed_above_join(boxes, boxes, cell=300.0)
    return out.select(
        F.col("text_id").alias("text_box"), F.col("image_id").alias("img_box")
    )


def q_dedup_lastwins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/D4: duplicate keys collapse, last (latest) wins."""
    ev = _t(spark, sf_dir, "events", key="user_id")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


_DEDUP_LASTWINS_ORACLE = """
SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# aggregations (A2/A3/A4) + TPC-H Q1 headline
# ---------------------------------------------------------------------------

def q_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: order-sensitive string concat per group (the per-page block
    concat re-expressed relationally: string_agg ... ORDER BY)."""
    ev = _t(spark, sf_dir, "events", key="user_id")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("event_seq")
        )
    )


_ORDERED_CONCAT_ORACLE = """
SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
FROM events GROUP BY 1
"""


def q_counter_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: total/conditional counters (blocks kept/dropped shape)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_COUNTER_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
"""


def q_status_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A6: the status-server aggregation shape (sum active,
    max configured, clamped idle — status_server.py:102-123)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("active"),
        F.round(F.max("value"), 2).alias("configured"),
    )
    return per_user.select(
        "user_id",
        "active",
        "configured",
        F.round(F.greatest(F.col("configured") - F.col("active"), F.lit(0.0)), 2).alias("idle"),
    )


_STATUS_AGG_ORACLE = """
SELECT user_id, active, configured,
       round(greatest(configured - active, 0.0), 2) AS idle
FROM (
  SELECT user_id, round(sum(value), 2) AS active, round(max(value), 2) AS configured
  FROM events GROUP BY 1
)
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style headline aggregation (relational muscle check)."""
    li = _t(spark, sf_dir, "lineitem", fan_out=False)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + filter + agg + top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1995-03-15"))
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    w = W.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "revenue",
            F.col("rk").cast("long").alias("rk"),
        )
    )


_SHIPPING_PRIORITY_ORACLE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       revenue, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT o_orderkey, o_orderdate,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         row_number() OVER (
           ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
                    o_orderkey ASC) AS rk
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  GROUP BY o_orderkey, o_orderdate
) WHERE rk <= 10
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through two broadcast-able dims."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        c.join(dims, c.c_nationkey == dims.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


_REGIONAL_REVENUE_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combos incl. grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
        F.count("*").cast("long").alias("n_rows"),
    )


_DISTINCT_AGG_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY 1
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers in segment A except those with orders,
    union customers in segment B intersect those with orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("ck")).distinct()
    seg_a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("ck")
    )
    seg_b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("ck")
    )
    return seg_a.exceptAll(with_orders).unionByName(
        seg_b.intersectAll(with_orders)
    ).distinct()


_SET_OPS_ORACLE = """
WITH w AS (SELECT DISTINCT o_custkey AS ck FROM orders)
SELECT DISTINCT ck FROM (
  (SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'BUILDING'
   EXCEPT ALL SELECT ck FROM w)
  UNION ALL
  (SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'MACHINERY'
   INTERSECT ALL SELECT ck FROM w)
)
"""


# ---------------------------------------------------------------------------
# windows / ordering / limits (W3/W4/W5/T4) + sessionize
# ---------------------------------------------------------------------------

def q_row_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: monotone numbering within a document (page_index analog)."""
    o = _t(spark, sf_dir, "orders", key="o_custkey")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("seq"),
    )


_ROW_NUMBER_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS seq
FROM orders
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-k (page limit analog) per group."""
    o = _t(spark, sf_dir, "orders", key="o_custkey")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rk
  FROM orders
) WHERE rk <= 3
"""


def q_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: string truncation caps (caption <= 512 analog)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 50).alias("text_head"),
        F.length("text").cast("long").alias("n_chars"),
    )


_TRUNCATE_ORACLE = """
SELECT doc_id, substr(text, 1, 50) AS text_head, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_continuation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: isStart/isEnd page-continuation flags via windows. Flags are
    int 0/1 (not boolean) so null-padding inside the windows_limits suite
    union stays one representation (NaN) in every comparator — NULL
    booleans render as None vs NaN between Arrow and DuckDB pandas
    bridges."""
    ev = _t(spark, sf_dir, "events", key="user_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wn = W.partitionBy("user_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.row_number().over(w) == 1).cast("int").alias("is_start"),
        (F.row_number().over(w) == F.count("*").over(wn)).cast("int").alias("is_end"),
    )


_CONTINUATION_ORACLE = """
SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1 AS INT) AS is_start,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          = count(*) OVER (PARTITION BY user_id) AS INT) AS is_end
FROM events
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min opens a session (lag + running sum)."""
    ev = _t(spark, sf_dir, "events", key="user_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


_SESSIONIZE_ORACLE = """
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# strings / scalars (X2/X3/X4/X6/X11) + streaming twin
# ---------------------------------------------------------------------------

def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: regex field extraction (bbox-from-filename analog)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("extracted_id"),
        "c_mktsegment",
    )


_REGEX_EXTRACT_ORACLE = r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS extracted_id,
       c_mktsegment
FROM customer
"""


def q_key_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: computed string keys from numerics (bbox key normalize analog;
    floor() on both sides — Spark rint is half-even, DuckDB round is
    half-away, so the demo key uses the rounding they share)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    key = F.concat_ws(
        "_",
        F.floor("l_extendedprice").cast("long").cast("string"),
        F.floor("l_quantity").cast("long").cast("string"),
        F.floor(F.col("l_discount") * 100).cast("long").cast("string"),
    )
    return li.select("l_orderkey", "l_linenumber", key.alias("bbox_key"))


_KEY_NORMALIZE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR) || '_' ||
       CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) || '_' ||
       CAST(CAST(floor(l_discount * 100) AS BIGINT) AS VARCHAR) AS bbox_key
FROM lineitem WHERE l_orderkey < 200
"""


def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the reference's HTML clean chain (drop <div><img></div>, drop
    <img>, drop tags, collapse whitespace, trim)."""
    from paddle_spark.functions import html_strip_chain

    p = _t(spark, sf_dir, "part")
    html = F.concat(
        F.lit('<DIV><IMG src="x.jpg"></div><p>'),
        F.col("p_name"),
        F.lit('</p> <img alt="y"> <b>'),
        F.col("p_brand"),
        F.lit("</b>"),
    )
    return p.select("p_partkey", html_strip_chain(html).alias("clean"))


_HTML_STRIP_ORACLE = r"""
SELECT p_partkey,
  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    '<DIV><IMG src="x.jpg"></div><p>' || p_name || '</p> <img alt="y"> <b>' || p_brand || '</b>',
    '<div[^>]*>\s*<img[^>]*>\s*</div>', '', 'gis'),
    '<img[^>]*>', '', 'gi'),
    '<[^>]+>', '', 'g'),
    '\s+', ' ', 'g')) AS clean
FROM part
"""


def q_html_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-modality table recognition (kernels/html.html_tables — the
    <table>-grid analog of the reference's SLANet table pipeline,
    pipeline_config.yaml:611-935, rendered under the same pipe-table
    markdown contract as kernels/table.py). Closed-form two-table
    fixture per document exercises the documented edge cases — a script
    island carrying a literal '</table>' (must not truncate), a pipe
    needing '\\|' escaping, and a ragged row needing right-padding —
    so the exact markdown is SQL-expressible."""
    import pandas as pd

    from paddle_spark.kernels.html import html_tables

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def to_md(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = [
                (
                    '<html><body><script>var s = "</table>";</script>'
                    "<p>prose</p><table class=x>"
                    "<tr><th>key</th><th>val</th></tr>"
                    f"<tr><td>a|{i}</td><td>{i}</td></tr>"
                    f"<tr><td>b{i}</td></tr>"
                    "</table><table><tr><td>solo</td></tr></table>"
                    "</body></html>"
                ).encode()
                for i in ids
            ]
            tbls = [html_tables(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tables": [len(t) for t in tbls],
                    "md": ["\n\n".join(t) for t in tbls],
                }
            )

    return docs.mapInPandas(
        to_md, schema="doc_id long, n_tables long, md string"
    )


# Backslash is literal inside DuckDB single-quoted strings, so 'a\|'
# spells the markdown pipe escape; the padded ragged cell renders as
# '|  |' (two spaces) exactly like the Spark-side renderer.
_HTML_TABLE_ORACLE = r"""
SELECT doc_id, CAST(2 AS BIGINT) AS n_tables,
  '| key | val |' || chr(10) ||
  '| --- | --- |' || chr(10) ||
  '| a\|' || doc_id || ' | ' || doc_id || ' |' || chr(10) ||
  '| b' || doc_id || ' |  |' || chr(10) || chr(10) ||
  '| solo |' || chr(10) ||
  '| --- |' AS md
FROM documents WHERE doc_id < 200
"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (scheme/host lowercase, default-port strip,
    fragment drop, tracking-param removal) + host extraction — the
    web-pipeline normalization that precedes url-keyed dedup. Inputs are
    constructed so the expected canonical form is closed-form SQL."""
    from paddle_spark.functions import canonical_url_col, host_col

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    raw = F.concat(
        F.lit("HTTPS://WWW.Shop"),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit(".Example.COM:443/Order/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?utm_source=mail&id="),
        F.col("o_orderkey").cast("string"),
        F.lit("#top"),
    )
    return o.select(
        "o_orderkey",
        canonical_url_col(raw).alias("canonical"),
        host_col(raw).alias("host"),
    )


_URL_CANON_ORACLE = """
SELECT o_orderkey,
  'https://www.shop' || (o_orderkey % 7) || '.example.com/Order/' ||
    o_orderkey || '?id=' || o_orderkey AS canonical,
  'shop' || (o_orderkey % 7) || '.example.com' AS host
FROM orders WHERE o_orderkey < 2000
"""


def q_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction: <a href> harvesting (absolute http(s)) +
    canonicalization + host — the crawl-graph edge list, exploded to
    scalar rows with an exact DuckDB twin."""
    from paddle_spark.functions import canonical_url_col, host_col, outlinks_col

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    html = F.concat(
        F.lit('<p>see <a href="HTTP://Partner'),
        (F.col("c_custkey") % 5).cast("string"),
        F.lit('.Example.ORG:80/ref?utm_campaign=x&cid='),
        F.col("c_custkey").cast("string"),
        F.lit('">link</a> and <a class="e" href=\'https://cdn.site.net/a/'),
        F.col("c_custkey").cast("string"),
        F.lit("'>two</a> plus <a href=\"/relative/skipped\">rel</a></p>"),
    )
    links = c.select(
        "c_custkey", F.explode(outlinks_col(html)).alias("href")
    )
    return links.select(
        "c_custkey",
        canonical_url_col(F.col("href")).alias("canonical"),
        host_col(F.col("href")).alias("host"),
    )


_OUTLINKS_ORACLE = """
SELECT c_custkey,
  'http://partner' || (c_custkey % 5) || '.example.org/ref?cid=' || c_custkey AS canonical,
  'partner' || (c_custkey % 5) || '.example.org' AS host
FROM customer WHERE c_custkey < 1000
UNION ALL
SELECT c_custkey,
  'https://cdn.site.net/a/' || c_custkey AS canonical,
  'cdn.site.net' AS host
FROM customer WHERE c_custkey < 1000
"""


def q_b64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: base64 encode/decode parity (the reference shuttles file and
    image payloads as b64, layout_captioning.py:20-45, testScript.py:20-22;
    our engine keeps binary columns, so b64 appears only at boundaries)."""
    p = _t(spark, sf_dir, "part")
    enc = F.base64(F.encode(F.col("p_name"), "utf-8"))
    return p.select(
        "p_partkey",
        enc.alias("b64"),
        F.decode(F.unbase64(enc), "utf-8").alias("roundtrip"),
    )


_B64_ORACLE = """
SELECT p_partkey,
       to_base64(encode(p_name)) AS b64,
       decode(from_base64(to_base64(encode(p_name)))) AS roundtrip
FROM part
"""


def q_data_uri_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: data-URI payload extraction (split on first comma)."""
    p = _t(spark, sf_dir, "part")
    uri = F.concat(F.lit("data:text/plain;base64,"), F.col("p_name"))
    return p.select(
        "p_partkey", F.split_part(uri, F.lit(","), F.lit(2)).alias("payload")
    )


_DATA_URI_ORACLE = """
SELECT p_partkey,
       split_part('data:text/plain;base64,' || p_name, ',', 2) AS payload
FROM part
"""


def _sql_chr(s: str) -> str:
    """DuckDB expression for an arbitrary Python string: safe-ASCII runs
    stay quoted literals, everything else becomes chr(codepoint) — so
    control characters and unicode noise never appear raw in oracle SQL."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if " " <= ch <= "~" and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


#: Unicode-noise recipes planted onto documents.text by doc_id % 5:
#: (prefix, suffix) pairs covering NBSP/ZWSP, BOM + C0 controls,
#: soft hyphen + em/narrow spaces, tab runs, and a no-noise control.
_NOISE = [
    ("\u00a0caf\u00e9\u200b ", " e\u0301clair\u3000fin"),
    ("\ufeff", " x\u0007y\u001bz"),
    ("na\u00efve\u00ad ", " \u2003wide\u202f"),
    ("", "\tcol \t umns\t"),
    ("", ""),
]


def _noisy_text_col() -> Column:
    m = F.pmod(F.col("doc_id"), F.lit(5))
    expr = F.col("text")
    out = None
    for i, (pre, suf) in enumerate(_NOISE):
        branch = F.concat(F.lit(pre), expr, F.lit(suf))
        out = F.when(m == i, branch) if out is None else out.when(m == i, branch)
    return out.otherwise(expr)


def _noisy_text_sql() -> str:
    cases = []
    for i, (pre, suf) in enumerate(_NOISE):
        piece = " || ".join(
            p for p in (_sql_chr(pre) if pre else "", "text", _sql_chr(suf) if suf else "")
            if p
        )
        cases.append(f"WHEN doc_id % 5 = {i} THEN {piece}")
    return "CASE " + " ".join(cases) + " ELSE text END"


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization (operators/normalize.py): documents
    text with deterministically planted unicode noise (NBSP/ZWSP/BOM/
    controls/soft-hyphen/wide-space recipes keyed by doc_id % 5) ->
    hygiene chain + NFC clean_text, codepoints-removed counter, and the
    CCNet-style hash-normalization key. The NFC / accent-strip arms are
    Arrow-batched pandas UDFs; DuckDB's nfc_normalize / strip_accents
    are the oracle twins, sharing one \\x{...} pattern string with the
    Spark side so the twin cannot drift."""
    from paddle_spark.operators import normalize as N

    d = _t(spark, sf_dir, "documents")
    noisy = _noisy_text_col()
    nd = d.select("doc_id", noisy.alias("text"))
    cleaned = N.nfc_col(N.clean_text_col(F.col("text")))
    return nd.select(
        "doc_id",
        cleaned.alias("clean_text"),
        (F.length("text") - F.length(cleaned)).cast("long").alias("n_removed"),
        N.norm_key_col(F.col("text")).alias("norm_key"),
    )


def _text_clean_oracle() -> str:
    from paddle_spark.operators import normalize as N

    noisy = _noisy_text_sql()
    clean = f"nfc_normalize({N.clean_text_sql('text')})"
    key = N.hash_key_normalize_sql("text")
    return f"""
WITH nd AS (SELECT doc_id, {noisy} AS text FROM documents)
SELECT doc_id,
       {clean} AS clean_text,
       CAST(length(text) - length({clean}) AS BIGINT) AS n_removed,
       {key} AS norm_key
FROM nd
"""


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter corpus membership (operators/bloom.py): build the
    bitset over the even-doc_id half of documents, probe ALL documents
    with k broadcast word-joins (map-only), and report membership. The
    fixture's (n, m, k) puts the expected false-positive count below
    10^-2 across the corpus, so bloom membership equals the exact
    semi-join — which is the oracle. FP behavior itself is pinned by
    tests/test_bloom.py on adversarial corpora."""
    from paddle_spark.operators.bloom import bloom_build, bloom_probe

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    bloom = bloom_build(corpus, "text")
    return bloom_probe(d, bloom, "text").select(
        "doc_id", F.col("in_bloom").cast("int").alias("in_corpus")
    )


_BLOOM_MEMBERSHIP_ORACLE = """
SELECT b.doc_id,
       CAST(CASE WHEN a.text IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_corpus
FROM documents b
LEFT JOIN (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0) a
  ON a.text = b.text
"""


def q_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 + streaming twin: tumbling 1h windows (the batch form of
    paddle_spark.streaming.batch_windowed_agg — identical results)."""
    from paddle_spark.streaming import batch_windowed_agg

    ev = _t(spark, sf_dir, "events", fan_out=False)
    out = batch_windowed_agg(ev, minutes=60)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        "event_type",
        "n",
        "sum_value",
    )


_TIME_BUCKETS_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal suite over the events table — order-sensitive concat
    (A2: string_agg ORDER BY), gap-based sessionization (lag + running
    sum), and tumbling 1h windows (X11, the batch twin of
    streaming.batch_windowed_agg). One null-padded union frame; each
    branch keeps its own exact oracle."""
    return _suite_frame(spark, sf_dir, [
        ("ordered_concat", q_ordered_concat),
        ("sessionize", q_sessionize),
        ("time_buckets", q_time_buckets),
    ])


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("rep_id"),
        F.count("*").cast("long").alias("n_dups"),
    ).select("rep_id", "n_dups")


_DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard pairs (threshold low: the corpus is
    word-salad, so only weak overlaps exist — the op still exercises the
    inverted-index join end-to-end)."""
    from paddle_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return ngram_jaccard_pairs(d, threshold=0.01).select(
        "a", "b", "n_inter", "n_a", "n_b", "jaccard"
    )


_NGRAM_JACCARD_ORACLE = r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
         ELSE [array_to_string(w, ' ')] END) AS t(s)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.n_inter,
       CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
       round(i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
WHERE round(i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter), 6) >= 0.01
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates (rows-only: xxhash64 has no DuckDB twin)."""
    from paddle_spark.operators.dedup import minhash_dedup_candidates

    d = _t(spark, sf_dir, "documents")
    return minhash_dedup_candidates(d, num_perm=32, bands=8)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + Hamming<=3 candidates (rows-only)."""
    from paddle_spark.operators.dedup import simhash, simhash_candidates

    d = _t(spark, sf_dir, "documents")
    return simhash_candidates(simhash(d), max_hamming=3)


def _planted_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 docs with namespace-disjoint token sets (every token embeds its
    doc_id, so distinct docs share ZERO shingles) + one exact copy each at
    doc_id + 1000000. Identical docs have identical minhash signatures and
    simhash fingerprints STRUCTURALLY; disjoint docs can only collide via
    64-bit hash collisions (~0, and deterministic either way) — so the
    candidate output is exactly the planted pairs, i.e. SQL-expressible."""
    d = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 50)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.concat(
                F.lit("w"), F.col("doc_id").cast("string"), F.lit("x"), i.cast("string")
            ),
        ),
    )
    base = d.select("doc_id", text.alias("text"))
    return base.unionByName(
        base.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )


_PLANTED_PAIRS_ORACLE = """
SELECT doc_id AS a, doc_id + 1000000 AS b
FROM documents WHERE doc_id < 50
"""


def q_dedup_minhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with an EXACT oracle: identical docs collide in every
    band by construction, disjoint docs in none — the full banding
    pipeline (shingle -> 32-perm signature -> 8-band bucket join) must
    return exactly the 50 planted pairs."""
    from paddle_spark.operators.dedup import minhash_dedup_candidates

    return minhash_dedup_candidates(
        _planted_dup_docs(spark, sf_dir), num_perm=32, bands=8
    )


def q_dedup_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash + banded Hamming join with an EXACT oracle: identical docs
    are Hamming-0, disjoint-token docs sit ~32 bits apart."""
    from paddle_spark.operators.dedup import simhash, simhash_candidates

    return simhash_candidates(
        simhash(_planted_dup_docs(spark, sf_dir)), max_hamming=3
    ).select("a", "b", F.col("hamming").cast("long").alias("hamming"))


_SIMHASH_PLANTED_ORACLE = """
SELECT doc_id AS a, doc_id + 1000000 AS b, CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id < 50
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.operators.dedup import embedding_near_dups

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dups(e, threshold=0.5)


_EMB_NEAR_DUP_ORACLE = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.5
"""


def q_dedup_embedding_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for embedding near-dup: banded hyperplane LSH ->
    (band, bucket) equi-join -> cosine filter.

    The fixture's natural pairs top out at cosine ~0.6 — below any sane
    near-dup threshold — so the query plants exact duplicates of the first
    5 vectors (vec_id + 1000000), identically in the oracle SQL. Identical
    vectors share every band bucket, so recall for the planted pairs is
    structurally 1.0 and the LSH output equals the exact pairwise result:
    a full hash-green oracle for the banded path."""
    from paddle_spark.operators.similarity import bucketed_near_dups

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return bucketed_near_dups(
        e.unionByName(planted), threshold=0.95, n_bands=8, planes_per_band=4,
        dim=64,
    )


_EMB_BUCKETED_ORACLE = """
WITH u AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 5
)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.95
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5).select(
        "qid", "cid", "cosine", F.col("rank").cast("long").alias("rank")
    )


_ANN_TOPK_ORACLE = """
SELECT qid, cid, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k with multi-probe (n_probe=2: the
    weakest-margin Hamming-1 bucket probes too). Rows-only by design
    (hyperplane hashing); the exact twin is ann_lsh_planted, and the
    recall-vs-probe curve is pinned by test_similarity."""
    from paddle_spark.operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_planes=6, n_probe=2)


def q_ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assign,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = deterministic_centroids(e, n_cells=8)
    return ivf_assign(e, cents).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "centroid_cosine"
    )


def q_ann_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF quantizer after ONE DataFrame-native k-means round
    (similarity.ivf_train: assign -> posexplode -> per-(cell,dim) avg ->
    collect n_cells rows) — the iterative-algorithm pattern with an EXACT
    oracle: DuckDB replays the same round in CTEs (assign via window
    argmax, per-dim avg via subscript unnest, rebuild lists, reassign).
    Means round to 6 on both sides so the refined centroids agree."""
    from paddle_spark.operators.similarity import ivf_assign, ivf_train

    e = _t(spark, sf_dir, "embeddings")
    cents = ivf_train(e, n_cells=8, n_rounds=1)
    return ivf_assign(e, cents).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "centroid_cosine"
    )


_IVF_REFINED_ORACLE = """
WITH cents0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         embedding::DOUBLE[] AS cv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) DESC,
                      c.cell DESC) AS rn
    FROM embeddings e CROSS JOIN cents0 c
  ) WHERE rn = 1
),
dims AS (
  SELECT a.cell, i.i AS dim, round(avg(e.embedding[i.i]), 6) AS m
  FROM a0 a JOIN embeddings e USING (vec_id)
       CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
  GROUP BY a.cell, i.i
),
cents1 AS (
  SELECT c0.cell, coalesce(d.cv1, c0.cv) AS cv
  FROM cents0 c0
  LEFT JOIN (SELECT cell, list(m ORDER BY dim) AS cv1 FROM dims GROUP BY cell) d
    ON c0.cell = d.cell
)
SELECT vec_id, cell, cos AS centroid_cosine FROM (
  SELECT e.vec_id, c.cell,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS cos,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) DESC,
                    c.cell DESC) AS rn
  FROM embeddings e CROSS JOIN cents1 c
) WHERE rn = 1
"""


_IVF_ORACLE = """
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         embedding::DOUBLE[] AS cv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
)
SELECT vec_id, cell, cos AS centroid_cosine
FROM (
  SELECT e.vec_id, c.cell,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS cos,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) DESC,
                    c.cell DESC) AS rn
  FROM embeddings e CROSS JOIN cents c
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (n_tokens/n_chars), quality scoring and document
    fingerprinting in ONE frame over documents — consolidates the former
    text_tokens / text_quality / text_fingerprint driver entries (same
    operators, one driver row; the per-operator pytest suites in
    test_textstats keep the fine-grained pins)."""
    from paddle_spark.operators.textstats import text_stats_frame

    # r6: the former quality ⋈ fingerprint ⋈ bpe three-scan/two-join plan
    # collapsed into one map-only select (guide §2.3/§2.4; all three are
    # per-row Column math over the same unique-id table — results
    # bit-identical, plan goes 3 scans + 3 exchanges + 2 joins -> 1 scan)
    d = _t(spark, sf_dir, "documents")
    return text_stats_frame(d)


def _sw_list(lang: str) -> str:
    from paddle_spark.operators.textstats import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


_TEXT_STATS_ORACLE = rf"""
WITH base AS (
  SELECT doc_id, text,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w != '')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
              w -> w != '' AND list_contains({_sw_list('en')}, lower(w)))) AS BIGINT) AS sw_en,
         sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp_sha256,
         CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens
  FROM documents
),
feats AS (
  SELECT doc_id, n_chars, n_tokens, fp_sha256, n_bpe_tokens,
         round(length(regexp_replace(text, '\s+', '', 'g')) / greatest(n_tokens, 1), 4) AS mean_word_len,
         round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
         round(n_upper / greatest(n_chars, 1), 4) AS upper_ratio,
         round(sw_en / greatest(n_tokens, 1), 4) AS stopword_ratio
  FROM base
)
SELECT doc_id, n_chars, n_tokens, mean_word_len, punct_ratio, upper_ratio, stopword_ratio,
       round(CASE WHEN n_tokens < 5 THEN 0.0 ELSE
         greatest(0.0, least(1.0,
           0.4 + 2.0*stopword_ratio - 2.0*punct_ratio - 1.0*upper_ratio
           + CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.2 ELSE -0.2 END))
       END, 4) AS quality_score,
       fp_sha256, n_bpe_tokens
FROM feats
"""


def _langid_oracle() -> str:
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"w -> w != '' AND list_contains({_sw_list(lang)}, lower(w)))) AS BIGINT) AS hits_{lang}"
        for lang in ("en", "de", "es", "hi")
    )
    # same tie-break as the Spark side: first lang in (en, de, es, hi) wins
    return f"""
WITH hits AS (
  SELECT doc_id,
         {hit_cols}
  FROM documents
)
SELECT doc_id, hits_en, hits_de, hits_es, hits_hi,
       CASE WHEN greatest(hits_en, hits_de, hits_es, hits_hi) = 0 THEN 'und'
            WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_hi) THEN 'en'
            WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_hi) THEN 'de'
            WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_hi) THEN 'es'
            ELSE 'hi' END AS lang_guess
FROM hits
"""


def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (per-language stopword hits + guess), Gopher-style
    repetition signals (dup-line/dup-word/top-bigram fractions), and the
    fastText/CCNet-style hashed-linear quality classifier (token -> md5
    hash bucket -> weight, mean-pooled logit -> sigmoid -> keep) in ONE
    frame — consolidates the former text_langid / text_repetition driver
    entries plus the r5 classifier. All pure Column ops incl. an
    aggregate-over-sorted-array bigram mode; the exact SQL twin uses
    unnest+groupBy for the mode and replays the identical md5 bucketing."""
    from paddle_spark.operators.textstats import (
        hashed_linear_score,
        langid,
        repetition_features,
    )

    d = _t(spark, sf_dir, "documents")
    lid = langid(d).select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}")
          for lang in ("en", "de", "es", "hi")],
        "lang_guess",
    )
    rep = repetition_features(d, id_col="doc_id", text_col="text")
    clf = hashed_linear_score(d).select(
        "doc_id", "logit", "prob", F.col("keep").alias("clf_keep")
    )
    return lid.join(rep, "doc_id").join(clf, "doc_id")


# classifier twin: identical md5-hex bucketing and the integer-exact
# surrogate model ((bucket % 197) - 98, scaled once after the sum) —
# verified bit-identical to the Spark side on sf0.01 (0 mismatches)
_CLASSIFIER_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') AS ws
  FROM documents
),
s AS (
  SELECT doc_id, len(ws) AS n,
    coalesce(list_sum(list_transform(ws,
      t -> ((('0x' || substring(md5(t),1,8))::BIGINT % 4096) % 197) - 98)), 0) AS wsum
  FROM base
),
lg AS (
  SELECT doc_id,
    CASE WHEN n > 0 THEN 0.0 + wsum/98.0/n ELSE 0.0 END AS raw_logit
  FROM s
)
SELECT doc_id,
  round(raw_logit, 6) AS logit,
  round(1.0/(1.0+exp(-raw_logit)), 6) AS prob,
  (1.0/(1.0+exp(-raw_logit)) >= 0.5) AS clf_keep
FROM lg
"""


def _text_signals_oracle() -> str:
    return f"""
WITH lid AS ({_langid_oracle()}),
rep AS ({_TEXT_REPETITION_ORACLE}),
clf AS ({_CLASSIFIER_ORACLE})
SELECT lid.doc_id, hits_en, hits_de, hits_es, hits_hi, lang_guess,
       dup_line_frac, dup_word_frac, top_bigram_frac,
       logit, prob, clf_keep
FROM lid JOIN rep ON lid.doc_id = rep.doc_id
         JOIN clf ON lid.doc_id = clf.doc_id
"""


_TEXT_REPETITION_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines,
         list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') AS words
  FROM documents
),
bi AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 2
              THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
              ELSE [] END AS bigrams,
         lines, words
  FROM base
),
tops AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS bg FROM bi) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT b.doc_id,
  CASE WHEN len(lines) > 0 THEN round((len(lines) - len(list_distinct(lines))) / len(lines), 6) ELSE 0.0 END AS dup_line_frac,
  CASE WHEN len(words) > 0 THEN round((len(words) - len(list_distinct(words))) / len(words), 6) ELSE 0.0 END AS dup_word_frac,
  CASE WHEN len(bigrams) > 0 THEN round(coalesce(t.top_c, 0) / len(bigrams), 6) ELSE 0.0 END AS top_bigram_frac
FROM bi b LEFT JOIN tops t USING (doc_id)
"""


# ---------------------------------------------------------------------------
# corpus safety: PII redaction + benchmark decontamination (operators/safety)
# ---------------------------------------------------------------------------

def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents<200 with one planted email + IPv4 + phone per row,
    derived from doc_id — identical construction in the oracle SQL so
    redaction correctness is hash-checkable end-to-end."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id").cast("string")
    text = F.concat(
        F.col("text"),
        F.lit(" u"), did, F.lit("@example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".9 tel +1 4155550"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
    )
    return d.select("doc_id", text.alias("text"))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/IPv4/phones -> typed tokens + audit counts),
    pure Column regexps in the Java-regex ∩ RE2 subset so the oracle runs
    the IDENTICAL pattern strings."""
    from paddle_spark.operators.safety import pii_redact

    return pii_redact(_pii_docs(spark, sf_dir))


def _pii_oracle() -> str:
    from paddle_spark.operators.safety import (
        EMAIL_PATTERN, EMAIL_TOKEN, IPV4_PATTERN, IPV4_TOKEN,
        PHONE_PATTERN, PHONE_TOKEN,
    )

    return f"""
WITH d AS (
  SELECT doc_id,
         text || ' u' || doc_id || '@example.com ip 10.0.' || (doc_id % 256)
              || '.9 tel +1 4155550' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
           AS text
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'),
      '{IPV4_PATTERN}', '{IPV4_TOKEN}', 'g'),
      '{PHONE_PATTERN}', '{PHONE_TOKEN}', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{IPV4_PATTERN}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS BIGINT) AS n_phones
FROM d
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-gram benchmark decontamination: benchmark = documents with
    doc_id % 97 == 0 (< 300); corpus = documents<300 plus verbatim copies
    of the benchmark docs at doc_id+1000000 (cross-doc contamination).
    Plan: explode to md5(gram) -> BROADCAST the distinct benchmark gram
    set -> hash join -> per-doc distinct count; the corpus side never
    shuffles before the final doc-id agg."""
    from paddle_spark.operators.safety import decontaminate

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    bench_rows = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.unionByName(
        bench_rows.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return decontaminate(corpus, bench_rows.select("text"), n=13)


_DECONTAMINATE_ORACLE = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id < 300 AND doc_id % 97 = 0
),
bw AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
  FROM documents WHERE doc_id < 300 AND doc_id % 97 = 0
),
bg AS (
  SELECT DISTINCT array_to_string(ws[i:i+12], ' ') AS gram
  FROM bw, UNNEST(range(1, len(ws) - 11)) AS t(i) WHERE len(ws) >= 13
),
cw AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
  FROM corpus
),
cg AS (
  SELECT doc_id, array_to_string(ws[i:i+12], ' ') AS gram
  FROM cw, UNNEST(range(1, len(ws) - 11)) AS t(i) WHERE len(ws) >= 13
)
SELECT cg.doc_id, CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_gram_hits
FROM cg JOIN bg USING (gram) GROUP BY 1
"""


def q_text_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-safety suite: PII redaction + benchmark decontamination
    (operators/safety.py), unioned by name."""
    return _suite_frame(spark, sf_dir, [
        ("pii_redact", q_pii_redact),
        ("decontaminate", q_decontaminate),
    ])


# ---------------------------------------------------------------------------
# corpus mixing: deterministic hash sampling + sequence packing
# ---------------------------------------------------------------------------

def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: per-lang keep rates
    decided by an md5-derived bucket of a stable key — reruns and the
    DuckDB oracle agree row-for-row (no RNG anywhere)."""
    from paddle_spark.operators.sampling import hash_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("key"),
    )
    return hash_sample(
        d, {"en": 0.3, "de": 1.0, "es": 0.0}, "lang", "key", default_rate=0.1
    ).select("doc_id", "lang")


_HASH_SAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, source || '/' || doc_id AS key FROM documents
)
SELECT doc_id, lang FROM d
WHERE ('0x' || substr(md5(key), 1, 8))::UBIGINT % 10000 <
      CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 10000
                WHEN 'es' THEN 0 ELSE 1000 END
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing (budget 200 tokens, 4 hash
    shards) — the iterative-algorithm pattern with an EXACT oracle: the
    per-shard greedy walk replays in DuckDB as a recursive CTE stepping
    rank-by-rank within each shard."""
    from paddle_spark.operators.sampling import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_sequences(d, budget=200, n_shards=4)


_PACK_SEQUENCES_ORACLE = """
WITH RECURSIVE t AS (
  SELECT doc_id AS id, CAST(doc_id % 4 AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id) AS rn
  FROM documents
),
p AS (
  SELECT id, shard, n_tokens, rn, CAST(0 AS BIGINT) AS seq_no,
         n_tokens AS used
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.id, t.shard, t.n_tokens, t.rn,
         CASE WHEN p.used + t.n_tokens <= 200 THEN p.seq_no
              ELSE p.seq_no + 1 END,
         CASE WHEN p.used + t.n_tokens <= 200 THEN p.used + t.n_tokens
              ELSE t.n_tokens END
  FROM p JOIN t ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT id, shard, seq_no, n_tokens FROM p
"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing at alpha=0.5 over the documents
    source strata: rate_s = sqrt(n_max/n_s) clamped to 1, then the same
    deterministic md5-bucket keep rule as hash_sample. sqrt/floor on
    exact integer counts are correctly-rounded IEEE in both engines, so
    the DuckDB twin replays the rates bit-identically."""
    from paddle_spark.operators.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents")
    key = F.concat(F.col("source"), F.lit("/"), F.col("doc_id"))
    src = d.select("doc_id", "source", key.alias("skey"))
    return temperature_sample(src, "source", "skey", alpha=0.5).select(
        "doc_id", "source"
    )


_TEMPERATURE_SAMPLE_ORACLE = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
     m AS (SELECT max(n) AS nm FROM c),
     r AS (SELECT source,
                  least(10000, CAST(floor(10000 * (sqrt(CAST(nm AS DOUBLE)) /
                        sqrt(CAST(n AS DOUBLE)))) AS BIGINT)) AS rate_bp
           FROM c, m)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE ('0x' || substr(md5(d.source || '/' || d.doc_id), 1, 8))::UBIGINT % 10000
      < r.rate_bp
"""


def q_corpus_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing suite: deterministic stratified hash sampling,
    temperature rebalancing (alpha=0.5), and greedy sequence packing
    (operators/sampling.py), unioned by name."""
    return _suite_frame(spark, sf_dir, [
        ("hash_sample", q_hash_sample),
        ("temperature_sample", q_temperature_sample),
        ("pack_sequences", q_pack_sequences),
    ])


def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddle_spark.operators.multimodal import binary_meta

    d = _t(spark, sf_dir, "documents")
    payload = F.encode(
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("<svg>"), F.col("text")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("%PDF-1.4 "), F.col("text")))
        .otherwise(F.col("text")),
        "utf-8",
    )
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    return binary_meta(media)


_MM_META_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(octet_length(encode(p)) AS BIGINT) AS n_bytes,
       sha256(p) AS sha256,
       CASE WHEN doc_id % 4 = 0 THEN 'html'
            WHEN doc_id % 4 = 1 THEN 'pdf'
            ELSE 'garbage' END AS kind
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '<svg>' || text
              WHEN doc_id % 4 = 1 THEN '%PDF-1.4 ' || text
              ELSE text END AS p
  FROM documents
)
"""


def q_ann_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k with an EXACT oracle: each query's planted identical twin
    shares every hyperplane sign bit (same bucket structurally) and wins
    rank 1 at cosine 1.0 — nothing else in the fixture exceeds ~0.6."""
    from paddle_spark.operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = e.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    corpus = e.unionByName(twins)
    queries = e.filter(F.col("vec_id") < 10)
    out = lsh_topk(corpus, queries, k=1, n_planes=8, dim=64)
    return out.filter(F.col("rank") == 1).select(
        "qid", "cid", "cosine", F.col("rank").cast("long").alias("rank")
    )


_ANN_LSH_PLANTED_ORACLE = """
SELECT vec_id AS qid, vec_id + 1000000 AS cid,
       CAST(1.0 AS DOUBLE) AS cosine, CAST(1 AS BIGINT) AS rank
FROM embeddings WHERE vec_id < 10
"""


def q_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the registry in round 4 (kept as a callable for
    tests/history): decode_media's plumbing is exactly covered by
    mm_decode_dims' exact oracle, and real pixel-derived features live
    in mm_visual_features/ann_pixel_topk. The digest feature remains the
    documented stand-in for NEURAL embeddings only."""
    from paddle_spark.operators.multimodal import decode_media

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")
    )
    dec = decode_media(media)
    return dec.select(
        "media_id", "width", "height", "n_frames",
        F.to_json("feature").alias("feature_json"), "decode_ok",
    )


# ---------------------------------------------------------------------------
# enrichment: caption join + merge-back (J1/J2/J5/J6/X2/F5/F7)
# ---------------------------------------------------------------------------

def q_mm_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode plumbing with an EXACT oracle: the digest-derived dims of
    decode_fake are reproducible in SQL (sha256 hex arithmetic), so the
    Arrow-batched mapInPandas stage gets a hash-green row (feature vector
    checked rows-only in mm_decode_stub; dims/frames checked here)."""
    from paddle_spark.operators.multimodal import decode_media

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")
    )
    return decode_media(media).select(
        "media_id", "width", "height", "n_frames", "decode_ok"
    )


_MM_DECODE_DIMS_ORACLE = """
SELECT doc_id AS media_id,
  64 + CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 192 AS width,
  64 + CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 192 AS height,
  1 + CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 4 AS n_frames,
  TRUE AS decode_ok
FROM documents
"""


def q_mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode with an EXACT oracle across FIVE codecs:
    solid-color PNGs (filter types 0-4 cycled per row, so unfiltering is
    load-bearing), 24-bpp BMPs, LZW-compressed TIFFs (real dictionary
    coding + strip layout), lossless WEBPs (VP8L prefix codes through
    the subtract-green transform, kernels/webp.py), and solid-gray
    baseline JPEGs (quant=8 makes the DC path lossless — kernels/jpeg.py
    gets a driver-exact row despite JPEG being lossy in general). Dims/colors are closed-form in
    doc_id; payloads run through kernels/pixels.py + the reference's
    frame preprocessing (3ch -> cap 128 -> BGR; model.py:328-334,
    :355-364). Solid color survives any correct resample, so per-channel
    means equal the planted color and capped dims follow
    int(round(d * 128/largest)) — banker's rounding on both sides
    (Python round / DuckDB round_even)."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import pixel_stats
    from paddle_spark.sources.synth import (
        make_bmp,
        make_jpeg,
        make_png,
        make_tiff,
        make_webp,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def to_img(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                w, h = 40 + (i * 13) % 200, 30 + (i * 17) % 200
                color = ((i * 11) % 256, (i * 29) % 256, (i * 53) % 256)
                solid = np.full((h, w, 3), color, dtype=np.uint8)
                if i % 5 == 0:
                    payloads.append(make_bmp(solid))
                elif i % 5 == 1:
                    payloads.append(
                        make_jpeg(np.full((h, w), color[0], dtype=np.uint8))
                    )
                elif i % 5 == 2:
                    payloads.append(
                        make_tiff(solid, compression="lzw", rows_per_strip=16)
                    )
                elif i % 5 == 3:
                    # 5th codec arm: WEBP lossless (VP8L prefix codes +
                    # subtract-green transform, kernels/webp.py)
                    payloads.append(make_webp(solid, subtract_green=True))
                else:
                    payloads.append(
                        make_png(solid, filter_types=[0, 1, 2, 3, 4])
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_img, schema="media_id long, payload binary")
    return pixel_stats(media, max_dim=128)


_MM_PIXEL_STATS_ORACLE = """
WITH d AS (
  SELECT doc_id,
         40 + (doc_id * 13) % 200 AS w,
         30 + (doc_id * 17) % 200 AS h,
         CAST((doc_id * 11) % 256 AS DOUBLE) AS r,
         CAST((doc_id * 29) % 256 AS DOUBLE) AS g,
         CAST((doc_id * 53) % 256 AS DOUBLE) AS b
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(CASE WHEN greatest(w, h) <= 128 THEN w
       ELSE greatest(1, CAST(round_even(w * 128.0 / greatest(w, h), 0) AS BIGINT))
       END AS INT) AS out_width,
  CAST(CASE WHEN greatest(w, h) <= 128 THEN h
       ELSE greatest(1, CAST(round_even(h * 128.0 / greatest(w, h), 0) AS BIGINT))
       END AS INT) AS out_height,
  CAST(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 3 END AS INT) AS n_channels,
  CASE WHEN doc_id % 5 = 1 THEN r ELSE r END AS mean_r,
  CASE WHEN doc_id % 5 = 1 THEN r ELSE g END AS mean_g,
  CASE WHEN doc_id % 5 = 1 THEN r ELSE b END AS mean_b,
  TRUE AS decode_ok
FROM d
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with an EXACT oracle over THREE animation/paging
    containers: ids %3==0 are animated GIFs (1..6 frames, real per-frame
    LZW, graphic-control extensions), %3==1 are APNGs (acTL/fcTL/fdAT
    chunks, per-frame deflate), %3==2 are multi-PAGE TIFFs (IFD chain,
    grayscale pages). Frame f of each is solid and closed-form in
    (doc_id, f); TIFF pages are gray so all three channel means equal
    the gray formula. frame_sample walks every 2nd frame,
    composites/decodes each for real, and reports dims + channel means —
    the 1-row -> N-frame-rows fan-out (U5), reference cap semantics
    model.py:344-351."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import frame_sample
    from paddle_spark.sources.synth import make_apng, make_gif, make_tiff_multi

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def to_gif(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                nf = 1 + i % 6
                w, h = 16 + i % 20, 12 + i % 15
                pal = [
                    [(i * 7 + f * 31) % 256, (i * 13 + f * 17) % 256,
                     (i * 19 + f * 11) % 256]
                    for f in range(nf)
                ]
                if i % 3 == 1:
                    rgb = [
                        np.full((h, w, 3), pal[f], dtype=np.uint8)
                        for f in range(nf)
                    ]
                    payloads.append(make_apng(rgb))
                elif i % 3 == 2:
                    gray = [
                        np.full((h, w), (i * 7 + f * 31) % 256, dtype=np.uint8)
                        for f in range(nf)
                    ]
                    payloads.append(make_tiff_multi(gray))
                else:
                    frames = [
                        np.full((h, w), f, dtype=np.uint8) for f in range(nf)
                    ]
                    payloads.append(make_gif(frames, pal))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_gif, schema="media_id long, payload binary")
    return frame_sample(media, every_k=2, max_frames=8)


_MM_FRAME_SAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 6 AS nf,
         16 + doc_id % 20 AS w, 12 + doc_id % 15 AS h
  FROM documents WHERE doc_id < 150
),
f AS (
  SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS frame_no FROM d
)
SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST((doc_id * 7 + frame_no * 31) % 256 AS DOUBLE) AS mean_r,
  CAST(CASE WHEN doc_id % 3 = 2 THEN (doc_id * 7 + frame_no * 31) % 256
       ELSE (doc_id * 13 + frame_no * 17) % 256 END AS DOUBLE) AS mean_g,
  CAST(CASE WHEN doc_id % 3 = 2 THEN (doc_id * 7 + frame_no * 31) % 256
       ELSE (doc_id * 19 + frame_no * 11) % 256 END AS DOUBLE) AS mean_b
FROM f
"""


def q_caption_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full caption-enrichment chain over part-derived blocks/images:
    filename-key parse -> last-wins key dedup -> size gate -> broadcast
    equi-join -> left merge-back."""
    from paddle_spark.operators.enrich import caption_blocks

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    x1 = (F.col("p_partkey") * 37 % 500).cast("double")
    y1 = (F.col("p_partkey") * 59 % 700).cast("double")
    blocks = p.select(
        F.concat(F.lit("u"), (F.col("p_partkey") % 10).cast("string")).alias("url"),
        F.lit(0).alias("page_no"),
        F.col("p_partkey").cast("int").alias("block_id"),
        F.when(F.col("p_partkey") % 3 == 0, "image").otherwise("text").alias("label"),
        x1.alias("x1"),
        y1.alias("y1"),
        (x1 + 100 + F.col("p_size") * 3).alias("x2"),
        (y1 + 100 + F.col("p_size") * 2).alias("y2"),
        F.col("p_name").alias("text"),
    )
    images = p.filter(F.col("p_partkey") % 6 == 0).select(
        F.concat(F.lit("u"), (F.col("p_partkey") % 10).cast("string")).alias("url"),
        F.lit(0).alias("page_no"),
        F.concat(
            F.lit("img_in_image_box_"),
            x1.cast("long").cast("string"), F.lit("_"),
            y1.cast("long").cast("string"), F.lit("_"),
            (x1 + 100 + F.col("p_size") * 3).cast("long").cast("string"), F.lit("_"),
            (y1 + 100 + F.col("p_size") * 2).cast("long").cast("string"),
            F.lit(".jpg"),
        ).alias("filename"),
    )
    return caption_blocks(blocks, images).select(
        "url", "block_id", "label", "text", "captioned"
    )


_CAPTION_ENRICH_ORACLE = """
WITH b0 AS (
  SELECT 'u' || (p_partkey % 10) AS url,
         CAST(p_partkey AS INTEGER) AS block_id,
         CASE WHEN p_partkey % 3 = 0 THEN 'image' ELSE 'text' END AS label,
         CAST(p_partkey * 37 % 500 AS DOUBLE) AS x1,
         CAST(p_partkey * 59 % 700 AS DOUBLE) AS y1,
         CAST(p_partkey * 37 % 500 + 100 + p_size * 3 AS DOUBLE) AS x2,
         CAST(p_partkey * 59 % 700 + 100 + p_size * 2 AS DOUBLE) AS y2,
         p_name AS text
  FROM part WHERE p_partkey < 400
),
bk AS (  -- bbox key + last-wins dedup (J5)
  SELECT * FROM (
    SELECT b0.*,
           CAST(CAST(x1 AS BIGINT) AS VARCHAR) || '_' || CAST(CAST(y1 AS BIGINT) AS VARCHAR)
             || '_' || CAST(CAST(x2 AS BIGINT) AS VARCHAR) || '_' || CAST(CAST(y2 AS BIGINT) AS VARCHAR)
             AS bbox_key,
           row_number() OVER (PARTITION BY url, bbox_key ORDER BY block_id DESC) AS rn
    FROM b0
  ) WHERE rn = 1
),
im AS (  -- image keys (only p_partkey % 6 = 0 rows have files)
  SELECT DISTINCT 'u' || (p_partkey % 10) AS url,
         CAST(p_partkey * 37 % 500 AS BIGINT) || '_' ||
         CAST(p_partkey * 59 % 700 AS BIGINT) || '_' ||
         CAST(p_partkey * 37 % 500 + 100 + p_size * 3 AS BIGINT) || '_' ||
         CAST(p_partkey * 59 % 700 + 100 + p_size * 2 AS BIGINT) AS bbox_key
  FROM part WHERE p_partkey < 400 AND p_partkey % 6 = 0
),
caps AS (  -- size gate (always passes here: w,h >= 100 by construction)
  SELECT bk.url, bk.bbox_key,
         '[image ' || CAST(CAST(bk.x2 - bk.x1 AS BIGINT) AS VARCHAR) || 'x'
           || CAST(CAST(bk.y2 - bk.y1 AS BIGINT) AS VARCHAR) || ']' AS caption
  FROM bk JOIN im ON bk.url = im.url AND bk.bbox_key = im.bbox_key
  WHERE bk.label = 'image'
    AND bk.x2 - bk.x1 >= 100 AND bk.y2 - bk.y1 >= 100
    AND (bk.x2 - bk.x1) * (bk.y2 - bk.y1) >= 10000
)
SELECT bk.url, bk.block_id, bk.label,
       CASE WHEN caps.caption IS NOT NULL THEN bk.text || ' ' || caps.caption
            ELSE bk.text END AS text,
       caps.caption IS NOT NULL AS captioned
FROM bk LEFT JOIN caps ON bk.url = caps.url AND bk.bbox_key = caps.bbox_key
"""


def q_extract_scanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CORE image dataflow end-to-end from pixels with an
    EXACT oracle (model.py:300-337: render -> detect -> order -> concat):
    synthetic "scanned pages" (deterministic 5x7 font on an advance grid,
    PNG-encoded, plus sub-threshold noise specks) are decoded to pixels,
    segmented by the run-union-find detector, grouped into lines by the
    SAME group_lines/reading_order kernels the PDF branch uses, and
    template-OCR'd back to text (kernels/scan.py). Page text, line count,
    glyph count and dropped-speck count are all closed-form in doc_id."""
    import pandas as pd

    from paddle_spark.operators.scanned import extract_scanned
    from paddle_spark.sources.synth import make_scanned_page

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 120
    )

    def to_page(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            yield pd.DataFrame(
                {
                    "url": [f"scan://{i}" for i in ids],
                    "payload": [make_scanned_page(i) for i in ids],
                }
            )

    pages = docs.mapInPandas(to_page, schema="url string, payload binary")
    return extract_scanned(pages).select(
        "url", "text", "n_glyphs", "n_lines", "n_dropped", "parse_ok"
    )


_EXTRACT_SCANNED_ORACLE = """
WITH docs AS (SELECT doc_id AS i FROM documents WHERE doc_id < 120),
ln AS (
  SELECT i, 0 AS j, 'DOC ' || i AS t FROM docs
  UNION ALL
  SELECT d.i, g.j, 'LINE ' || g.j || ' CODE ' || ((d.i*31+g.j)%97) AS t
  FROM docs d,
       LATERAL (SELECT unnest(generate_series(1, 1 + CAST(d.i % 4 AS INT))) AS j) g
),
agg AS (
  SELECT i, string_agg(t, chr(10) ORDER BY j) AS text, COUNT(*) AS n_lines
  FROM ln GROUP BY i
)
SELECT 'scan://' || i AS url, text,
  CAST(length(replace(replace(text, chr(10), ''), ' ', '')) AS INT) AS n_glyphs,
  CAST(n_lines AS INT) AS n_lines,
  CAST(i % 3 AS INT) AS n_dropped,
  TRUE AS parse_ok
FROM agg
"""


def _split_tone_media(
    spark: SparkSession, sf_dir: str, n: int, parity_patch: bool = False
) -> DataFrame:
    """Two-tone 36x16 grayscale PNG fixtures whose visual features are
    closed-form in doc_id: columns [0, 4m+2) hold shade A = 40+(i*13)%60,
    the rest shade B = A+100, with m = 1 + i%6. The 9x8 dhash grid then
    samples m columns of A, one A/B midpoint, and 8-m of B, so the
    difference hash is exactly (3 << (m-1)) * 0x0101010101010101, and the
    4-bin histogram fractions are (4m+2)/36 at bin A//64 and the rest at
    bin (A+100)//64.

    ``parity_patch``: odd ids additionally get pixel rows 14-15 (exactly
    dhash grid row 7) overwritten with shade B, zeroing that row's two
    gradient bits — so same-m pairs sit at Hamming distance 0 (same
    parity) or exactly 2 (mixed parity), closed-form for the visual
    near-dup oracle."""
    import numpy as np
    import pandas as pd

    from paddle_spark.sources.synth import make_png

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < n
    )

    def to_img(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                m = 1 + i % 6
                a = 40 + (i * 13) % 60
                img = np.full((16, 36, 3), a + 100, dtype=np.uint8)
                img[:, : 4 * m + 2] = a
                if parity_patch and i % 2 == 1:
                    img[14:16, :] = a + 100
                payloads.append(make_png(img))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.mapInPandas(to_img, schema="media_id long, payload binary")


def q_mm_visual_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-derived visual features with an EXACT oracle: dhash (bilinear
    9x8 grid gradient signs) and channel-histogram embedding fractions
    computed from REAL decoded PNG pixels (operators/multimodal.py
    visual_features — the retirement of decode_fake's digest feature).
    The two-tone fixture family makes both closed-form in doc_id; h0..h3
    unpack the red-channel histogram (channels identical on gray
    fixtures; the full 12-dim array feeds ann_pixel_topk)."""
    from paddle_spark.operators.multimodal import visual_features

    media = _split_tone_media(spark, sf_dir, 120)
    vf = visual_features(media)
    return vf.select(
        "media_id",
        "dhash",
        F.element_at("feature", 1).alias("h0"),
        F.element_at("feature", 2).alias("h1"),
        F.element_at("feature", 3).alias("h2"),
        F.element_at("feature", 4).alias("h3"),
        "decode_ok",
    )


_VISUAL_FIXTURE_CTE = """
WITH d AS (
  SELECT doc_id AS i,
         1 + doc_id % 6 AS m,
         40 + (doc_id * 13) % 60 AS a
  FROM documents WHERE doc_id < {n}
),
f AS (
  SELECT i, m, a,
         CAST(a // 64 AS INT) AS bin_a,
         CAST((a + 100) // 64 AS INT) AS bin_b,
         round((4*m + 2) / 36.0, 6) AS fa,
         round((36 - (4*m + 2)) / 36.0, 6) AS fb
  FROM d
),
h AS (
  SELECT i, m,
         CASE WHEN bin_a = 0 THEN fa WHEN bin_b = 0 THEN fb ELSE 0.0 END AS h0,
         CASE WHEN bin_a = 1 THEN fa WHEN bin_b = 1 THEN fb ELSE 0.0 END AS h1,
         CASE WHEN bin_a = 2 THEN fa WHEN bin_b = 2 THEN fb ELSE 0.0 END AS h2,
         CASE WHEN bin_a = 3 THEN fa WHEN bin_b = 3 THEN fb ELSE 0.0 END AS h3
  FROM f
)
"""

_MM_VISUAL_ORACLE = _VISUAL_FIXTURE_CTE.format(n=120) + """
SELECT i AS media_id,
       (CAST(3 AS BIGINT) << (m - 1)) * 72340172838076673 AS dhash,
       h0, h1, h2, h3, TRUE AS decode_ok
FROM h
"""


def q_extract_scanned_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCANNED PDFs through the PRODUCTION extraction pipeline with an
    EXACT oracle: one-page PDFs whose only content is an embedded image
    XObject of the rendered page scan — half 8-bpc gray behind
    /FlateDecode, half /DCTDecode (the raw stream IS a baseline JPEG,
    the real scanner-output layout). extract_pages classifies them as
    PDF, finds no text layer, decodes the page image from the object
    graph (kernels/pdf.py), and runs the deterministic OCR chain
    (kernels/scan.py) inside the same page assembly — the reference's
    core dataflow (model.py:300-337) as one driver-checked row."""
    import pandas as pd

    from paddle_spark.operators.extract_job import extract_pages

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_pdf(batches):
        from paddle_spark.sources.synth import make_scanned_pdf

        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            yield pd.DataFrame(
                {
                    "url": [f"scanpdf://{i}" for i in ids],
                    "warc_ts": [None] * len(ids),
                    "html": [
                        make_scanned_pdf(i, "dct" if i % 2 else "flate")
                        for i in ids
                    ],
                    "lang": ["en"] * len(ids),
                }
            )

    pages = docs.mapInPandas(
        to_pdf, schema="url string, warc_ts timestamp, html binary, lang string"
    )
    return extract_pages(pages, n_partitions=8).select(
        "url", "text", "n_blocks_kept", "n_blocks_dropped", "parse_ok", "branch"
    )


_EXTRACT_SCANNED_PDF_ORACLE = """
WITH docs AS (SELECT doc_id AS i FROM documents WHERE doc_id < 100),
ln AS (
  SELECT i, 0 AS j, 'DOC ' || i AS t FROM docs
  UNION ALL
  SELECT d.i, g.j, 'LINE ' || g.j || ' CODE ' || ((d.i*31+g.j)%97) AS t
  FROM docs d,
       LATERAL (SELECT unnest(generate_series(1, 1 + CAST(d.i % 4 AS INT))) AS j) g
),
agg AS (
  SELECT i, string_agg(t, chr(10) ORDER BY j) AS body, COUNT(*) AS n_lines
  FROM ln GROUP BY i
)
SELECT 'scanpdf://' || i AS url,
       '=== PAGE 1 ===' || chr(10) || chr(10) || body || chr(10) AS text,
       CAST(n_lines AS INT) AS n_blocks_kept,
       CAST(i % 3 AS INT) AS n_blocks_dropped,
       TRUE AS parse_ok,
       'layout' AS branch
FROM agg
"""


def q_extract_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orientation-classify stage in front of the scanned-page chain
    with an EXACT oracle (the reference's doc_image_orientation module,
    pipeline_config.yaml:264-272: classify 0/90/180/270, rotate upright,
    then OCR): pages arrive rotated clockwise by (doc_id % 4) quarter
    turns, ocr_page_oriented scores all four candidates by template-match
    glyph count, and the reported rotation, recovered text, line/glyph/
    speck counts are all closed-form in doc_id (kernels/scan.py
    ocr_page_oriented; operators/scanned.extract_scanned_oriented)."""
    import pandas as pd

    from paddle_spark.operators.scanned import extract_scanned_oriented
    from paddle_spark.sources.synth import make_rotated_scan

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 120
    )

    def to_page(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            yield pd.DataFrame(
                {
                    "url": [f"rot://{i}" for i in ids],
                    "payload": [make_rotated_scan(i) for i in ids],
                }
            )

    pages = docs.mapInPandas(to_page, schema="url string, payload binary")
    return extract_scanned_oriented(pages).select(
        "url", "rotation", "text", "n_glyphs", "n_lines", "n_dropped", "parse_ok"
    )


_EXTRACT_ORIENTATION_ORACLE = """
WITH docs AS (SELECT doc_id AS i FROM documents WHERE doc_id < 120),
ln AS (
  SELECT i, 0 AS j, 'DOC ' || i AS t FROM docs
  UNION ALL
  SELECT d.i, g.j, 'LINE ' || g.j || ' CODE ' || ((d.i*31+g.j)%97) AS t
  FROM docs d,
       LATERAL (SELECT unnest(generate_series(1, 1 + CAST(d.i % 4 AS INT))) AS j) g
),
agg AS (
  SELECT i, string_agg(t, chr(10) ORDER BY j) AS text, COUNT(*) AS n_lines
  FROM ln GROUP BY i
)
SELECT 'rot://' || i AS url,
  CAST(i % 4 AS INT) AS rotation,
  text,
  CAST(length(replace(replace(text, chr(10), ''), ' ', '')) AS INT) AS n_glyphs,
  CAST(n_lines AS INT) AS n_lines,
  CAST(i % 3 AS INT) AS n_dropped,
  TRUE AS parse_ok
FROM agg
"""


def q_extract_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-structure assembly with an EXACT oracle (the reference's
    SLANet table-recognition blocks in the markdown output,
    pipeline_config.yaml:611-935): table blocks carry detected cell
    boxes; kernels/table.py recovers the row/column grid (y-overlap row
    clustering + global x-interval column clustering, each cell's x
    jittered a few px) and renders a GitHub pipe table for markdown mode
    and a tab-separated flatten for the plain text path — both outputs
    closed-form in doc_id."""
    import pandas as pd

    from paddle_spark.kernels.layout import extract_layout
    from paddle_spark.sources.synth import make_table_pdf

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_tbl(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = [make_table_pdf(i) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "md": [extract_layout(p, markdown=True)[0] for p in payloads],
                    "text": [extract_layout(p)[0] for p in payloads],
                }
            )

    return docs.mapInPandas(to_tbl, schema="doc_id long, md string, text string")


def _tables_oracle() -> str:
    """Spell the closed-form make_table_pdf grid as one SQL expression:
    cell (r, c) value = (doc_id*7 + r*13 + c*5) % 100, 3 grid rows,
    2 + doc_id%2 columns."""
    def v(r: int, c: int) -> str:
        return f"CAST((doc_id*7 + {r * 13} + {c * 5}) % 100 AS VARCHAR)"

    def md_cells(n_cols: int) -> str:
        rows = []
        hdr = " || ' | ' || ".join(f"'C0{c} ' || {v(0, c)}" for c in range(n_cols))
        rows.append(f"'| ' || {hdr} || ' |'")
        rows.append("'| " + " | ".join(["---"] * n_cols) + " |'")
        for r in (1, 2):
            cells = " || ' | ' || ".join(
                f"'C{r}{c} ' || {v(r, c)}" for c in range(n_cols)
            )
            rows.append(f"'| ' || {cells} || ' |'")
        return " || chr(10) || ".join(rows)

    def plain_cells(n_cols: int) -> str:
        rows = []
        for r in range(3):
            rows.append(" || chr(9) || ".join(
                f"'C{r}{c} ' || {v(r, c)}" for c in range(n_cols)
            ))
        return " || chr(10) || ".join(rows)

    md = (
        "'# Page 1' || chr(10) || chr(10) || '## Table doc ' || doc_id "
        "|| chr(10) || chr(10) || "
        f"CASE WHEN doc_id % 2 = 0 THEN {md_cells(2)} ELSE {md_cells(3)} END "
        "|| chr(10) || 'After ' || doc_id || chr(10) || "
        "'![](imgs/img_in_image_box_100_800_500_1100.jpg)' || chr(10)"
    )
    plain = (
        "'=== PAGE 1 ===' || chr(10) || chr(10) || 'Table doc ' || doc_id "
        "|| chr(10) || "
        f"CASE WHEN doc_id % 2 = 0 THEN {plain_cells(2)} ELSE {plain_cells(3)} END "
        "|| chr(10) || 'After ' || doc_id || chr(10) || chr(10)"
    )
    return (
        f"SELECT doc_id, {md} AS md, {plain} AS text "
        "FROM documents WHERE doc_id < 100"
    )


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING with an EXACT oracle — the stage after pair
    generation that every dedup pipeline needs (A~B and B~C must also
    collapse A with C): iterative min-label propagation connected
    components (operators/dedup.cluster_pairs) over planted CHAIN pairs
    — cluster c = ids 4c..4c+3, but only members with position <= c%4
    are chained by consecutive-id edges, so components have diameter up
    to 3 (transitive closure is load-bearing, direct pairs alone would
    under-merge) and every fourth cluster is all singletons. cluster_id
    = smallest member, is_canonical marks the kept row; both closed-form
    in doc_id."""
    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 120
    )
    c = (F.col("doc_id") / 4).cast("long")
    p = F.col("doc_id") % 4
    pairs = docs.filter((p >= 1) & (p <= c % 4)).select(
        (F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    from paddle_spark.operators.dedup import dedup_transitive

    return dedup_transitive(docs, pairs)


_DEDUP_CLUSTER_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id % 4 <= (doc_id // 4) % 4
       THEN 4 * (doc_id // 4) ELSE doc_id END AS cluster_id,
  doc_id = CASE WHEN doc_id % 4 <= (doc_id // 4) % 4
                THEN 4 * (doc_id // 4) ELSE doc_id END AS is_canonical
FROM documents WHERE doc_id < 120
"""


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV/PCM decode with an EXACT oracle (kernels/riffav.py +
    operators/multimodal.audio_stats): square-wave fixtures at dyadic
    amplitudes (1 + i%8)/128 — exactly representable at BOTH 8-bit and
    16-bit quantization — so RMS == peak == amplitude bit-exactly, and
    n_samples = 8000 + 400*(i%7) at 8 kHz gives integral durations."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import audio_stats
    from paddle_spark.sources.synth import make_wav

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_wav(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                amp = (1 + i % 8) / 128.0
                n = 8000 + 400 * (i % 7)
                sq = np.tile([amp, -amp], n // 2)
                ch = 1 + i % 2
                sig = np.stack([sq] * ch, axis=1)
                bits = 8 if i % 3 == 0 else 16
                payloads.append(make_wav(sig, 8000, bits))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_wav, schema="media_id long, payload binary")
    return audio_stats(media).filter(F.col("decode_ok")).drop("decode_ok")


_AUDIO_STATS_ORACLE = """
SELECT doc_id AS media_id,
  8000 AS sample_rate,
  CAST(1 + doc_id % 2 AS INT) AS channels,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
  CAST(8000 + 400 * (doc_id % 7) AS BIGINT) AS n_samples,
  (8000 + 400 * (doc_id % 7)) / 8.0 AS duration_ms,
  (1 + doc_id % 8) / 128.0 AS rms,
  (1 + doc_id % 8) / 128.0 AS peak
FROM documents WHERE doc_id < 100
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling with an EXACT oracle over BOTH AVI
    arms: even ids are MJPEG containers (spec-twin make_avi_mjpeg; each
    frame a complete baseline JPEG whose flat-quant DC path decodes the
    planted gray losslessly — same property the mm_pixel_stats JPEG arm
    uses — decoded through the SAME pixel codec as images,
    kernels/jpeg.py) and odd ids are UNCOMPRESSED BI_RGB containers
    (make_avi_raw; bottom-up padded DIB rows,
    kernels/riffav.decode_dib_frame). The planted solid gray makes the
    expected means identical for both, so one oracle covers the two
    decode paths."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import video_frames
    from paddle_spark.sources.synth import make_avi_mjpeg, make_avi_raw, make_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_avi(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                w, h = 16 + 8 * (i % 5), 16 + 8 * (i % 3)
                grays = [(i * 37 + f * 11) % 250 for f in range(2 + i % 4)]
                if i % 2 == 0:
                    payloads.append(make_avi_mjpeg(
                        [make_jpeg(np.full((h, w), g, np.uint8)) for g in grays],
                        w, h,
                    ))
                else:
                    payloads.append(make_avi_raw(
                        [np.full((h, w, 3), g, np.uint8) for g in grays]
                    ))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_avi, schema="media_id long, payload binary")
    return video_frames(media, every_k=1, max_frames=8)


_VIDEO_FRAMES_ORACLE = """
WITH d AS (SELECT doc_id AS i FROM documents WHERE doc_id < 100)
SELECT d.i AS media_id,
  CAST(g.f AS INT) AS frame_no,
  CAST(16 + 8 * (d.i % 5) AS INT) AS width,
  CAST(16 + 8 * (d.i % 3) AS INT) AS height,
  CAST((d.i * 37 + g.f * 11) % 250 AS DOUBLE) AS mean_r,
  CAST((d.i * 37 + g.f * 11) % 250 AS DOUBLE) AS mean_g,
  CAST((d.i * 37 + g.f * 11) % 250 AS DOUBLE) AS mean_b
FROM d, LATERAL (SELECT unnest(generate_series(0, 1 + CAST(d.i % 4 AS INT))) AS f) g
"""


def q_container_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-level a/v metadata over all three movie containers with
    an EXACT oracle: doc_id % 3 picks ISO-BMFF (make_mp4), EBML/WebM
    (make_webm) or raw AVI (make_avi_raw); ids >= 90 are planted text
    garbage that must degrade to decode_ok=false — every field is
    closed-form in doc_id."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import container_meta
    from paddle_spark.sources.synth import make_avi_raw, make_mp4, make_webm

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def to_media(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                if i >= 90:
                    payloads.append(b"not a movie %d" % i)
                elif i % 3 == 0:
                    payloads.append(make_mp4(
                        1000, 1000 * (3 + i % 7), 640 + i % 5, 360 + i % 3,
                        version=i % 2,
                    ))
                elif i % 3 == 1:
                    payloads.append(make_webm(
                        float(2 + i % 6), 320 + i % 4, 240 + i % 2,
                        audio_hz=48000,
                    ))
                else:
                    w, h = 16 + 8 * (i % 5), 16 + 8 * (i % 3)
                    frames = [np.zeros((h, w, 3), np.uint8)] * (2 + i % 4)
                    payloads.append(make_avi_raw(frames, fps=25))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_media, schema="media_id long, payload binary")
    # decode_ok is a nullable boolean once null-padded across the suite
    # union, which DuckDB's pandas bridge renders as float NaN — the
    # garbage rows stay visible as format='unknown' with NULL fields.
    return container_meta(media).drop("decode_ok")


_CONTAINER_META_ORACLE = """
WITH d AS (SELECT doc_id AS i FROM documents WHERE doc_id < 100)
SELECT i AS media_id,
  CASE WHEN i >= 90 THEN 'unknown'
       WHEN i % 3 = 0 THEN 'mp4'
       WHEN i % 3 = 1 THEN 'webm' ELSE 'avi' END AS format,
  CASE WHEN i >= 90 THEN NULL
       WHEN i % 3 = 0 THEN CAST(1000 * (3 + i % 7) AS DOUBLE)
       WHEN i % 3 = 1 THEN CAST(1000 * (2 + i % 6) AS DOUBLE)
       ELSE CAST((2 + i % 4) * 40 AS DOUBLE) END AS duration_ms,
  CAST(CASE WHEN i >= 90 THEN 0
       WHEN i % 3 = 0 THEN 2 WHEN i % 3 = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_tracks,
  CAST(CASE WHEN i >= 90 THEN NULL
       WHEN i % 3 = 0 THEN 640 + i % 5
       WHEN i % 3 = 1 THEN 320 + i % 4
       ELSE 16 + 8 * (i % 5) END AS BIGINT) AS width,
  CAST(CASE WHEN i >= 90 THEN NULL
       WHEN i % 3 = 0 THEN 360 + i % 3
       WHEN i % 3 = 1 THEN 240 + i % 2
       ELSE 16 + 8 * (i % 3) END AS BIGINT) AS height
FROM d
"""


def q_mm_audio_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio + video suite: WAV/PCM feature extraction, AVI/MJPEG frame
    sampling (kernels/riffav.py), and container-level metadata over
    MP4/WebM/AVI (kernels/bmff.py, ebml.py), unioned by name."""
    return _suite_frame(spark, sf_dir, [
        ("audio_stats", q_audio_stats),
        ("video_frames", q_video_frames),
        ("container_meta", q_container_meta),
    ])


def q_visual_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate detection at scale with an EXACT oracle:
    banded Hamming join over the pixel dhash (operators/multimodal.
    visual_near_dups — 16-bit chunk equi-join candidates, xor+bit_count
    filter, pigeonhole-complete for distance <= 3 with 4 bands). The
    parity-patched split-tone fixtures put same-m pairs at distance 0 or
    exactly 2 and all cross-m pairs at >= 14, so the qualifying pair set
    and each pair's Hamming distance are closed-form in doc_id."""
    from paddle_spark.operators.multimodal import visual_near_dups

    media = _split_tone_media(spark, sf_dir, 80, parity_patch=True)
    return visual_near_dups(media, max_hamming=3, n_bands=4)


_VISUAL_NEAR_DUP_ORACLE = """
WITH d AS (
  SELECT doc_id AS i, 1 + doc_id % 6 AS m, doc_id % 2 AS par
  FROM documents WHERE doc_id < 80
)
SELECT a.i AS id_a, b.i AS id_b,
       CAST(CASE WHEN a.par = b.par THEN 0 ELSE 2 END AS INT) AS hamming
FROM d a JOIN d b ON a.i < b.i AND a.m = b.m
"""


def q_ann_pixel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN chain consuming PIXEL-DERIVED feature vectors (not digest
    stand-ins): brute-force cosine top-3 over the 12-dim histogram
    embeddings that visual_features extracts from decoded PNGs. The
    oracle rebuilds the same embeddings closed-form and replays cosine +
    window ranking in DuckDB (list_cosine_similarity)."""
    from paddle_spark.operators.multimodal import visual_features
    from paddle_spark.operators.similarity import brute_force_topk

    vf = visual_features(_split_tone_media(spark, sf_dir, 60)).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    q = vf.filter(F.col("vec_id") < 8)
    return brute_force_topk(vf, q, k=3)


_ANN_PIXEL_ORACLE = _VISUAL_FIXTURE_CTE.format(n=60) + """,
emb AS (
  SELECT i AS vec_id,
         [h0, h1, h2, h3, h0, h1, h2, h3, h0, h1, h2, h3]::DOUBLE[] AS v
  FROM h
)
SELECT qid, cid, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         round(list_cosine_similarity(q.v, c.v), 6) AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                    c.vec_id ASC) AS rank
  FROM emb q JOIN emb c ON q.vec_id < 8 AND c.vec_id != q.vec_id
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# consolidated suites: several single-operator demos united into one frame
# (Spark unionByName(allowMissingColumns) ≡ DuckDB UNION ALL BY NAME, both
# null-padding by column name) so the whole registry fits inside one driver
# correctness window — every entry gets a row every round, no rotation.
# ---------------------------------------------------------------------------

def _suite_frame(
    spark: SparkSession,
    sf_dir: str,
    parts: list[tuple[str, Callable[[SparkSession, str], DataFrame]]],
) -> DataFrame:
    from functools import reduce

    frames = [
        q(spark, sf_dir).select(F.lit(n).alias("q"), "*") for n, q in parts
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def _suite_oracle(parts: list[tuple[str, str]]) -> str:
    return "\nUNION ALL BY NAME\n".join(
        f"SELECT '{n}' AS q, * FROM ({sql})" for n, sql in parts
    )


def q_relational_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core relational aggregation suite — pricing summary (TPC-H Q1
    shape), region-rollup join revenue (Q5 shape), grouping-sets cube,
    distinct aggregates, and shipping-priority window (Q3 shape) — as one
    null-padded union frame. Each branch keeps its own exact oracle
    semantics; `q` labels the branch."""
    return _suite_frame(spark, sf_dir, [
        ("pricing_summary", q_pricing_summary),
        ("regional_revenue", q_regional_revenue),
        ("cube_rollup", q_cube_rollup),
        ("distinct_agg", q_distinct_agg),
        ("shipping_priority", q_shipping_priority),
    ])


def q_windows_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window/order/limit suite — per-group top-k (W4), row numbering
    (W3), continuation flags (T4), set ops, and truncation (W5)."""
    return _suite_frame(spark, sf_dir, [
        ("topk_per_group", q_topk_per_group),
        ("row_numbering", q_row_numbering),
        ("continuation_flags", q_continuation_flags),
        ("set_ops", q_set_ops),
        ("truncate", q_truncate),
    ])


def q_job_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4/A6 consolidated: total/conditional counters and the
    status-server aggregation (sum active / max configured / clamped
    idle) as one null-padded union suite."""
    return _suite_frame(spark, sf_dir, [
        ("counter_aggregates", q_counter_aggregates),
        ("status_aggregation", q_status_aggregation),
    ])


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF suite: deterministic-seed assignment and the quantizer after
    ONE DataFrame-native k-means round (ivf_train), same schema."""
    return _suite_frame(spark, sf_dir, [
        ("ivf_assign", q_ann_ivf_assign),
        ("ivf_refined", q_ann_ivf_refined),
    ])


def q_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twins for the rows-only hash-dependent dedup paths: the
    full MinHash banding pipeline and the SimHash banded Hamming join on
    planted inputs whose outputs are closed-form (the 50 planted pairs)."""
    return _suite_frame(spark, sf_dir, [
        ("minhash_planted", q_dedup_minhash_planted),
        ("simhash_planted", q_dedup_simhash_planted),
    ])


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level boilerplate removal with an EXACT oracle: two
    boilerplate paragraphs planted across docs (doc_id % 3 / % 5) must
    be dropped while each unique main paragraph survives verbatim —
    counts are closed-form indicator sums."""
    from paddle_spark.operators.dedup import paragraph_dedup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("\n\nSubscribe to our newsletter")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\n\nAll rights reserved")).otherwise(F.lit("")),
    )
    return paragraph_dedup(d.select("doc_id", text.alias("text")))


_PARAGRAPH_DEDUP_ORACLE = """
SELECT doc_id, text AS clean_text, CAST(1 AS BIGINT) AS n_paras_kept,
       CAST((doc_id % 3 = 0)::INT + (doc_id % 5 = 0)::INT AS BIGINT)
         AS n_paras_dropped
FROM documents WHERE doc_id < 200
"""


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span removal (k=8 tokens): two
    boilerplate sentences planted across docs (doc_id % 4 / % 7) plus
    whatever k-token windows naturally recur in the corpus text. The
    oracle REPLAYS the whole rolling-hash algorithm in SQL (not a
    closed-form), so the general semantics — window keys, global counts,
    coverage union, reassembly — are what gets hash-checked."""
    from paddle_spark.operators.dedup import span_dedup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" please accept cookies to continue browsing this very website")
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" copyright notice all content rights reserved worldwide forever")
               ).otherwise(F.lit("")),
    )
    return span_dedup(d.select("doc_id", text.alias("text")), k=8)


_SPAN_DEDUP_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 4 = 0
                THEN ' please accept cookies to continue browsing this very website'
                ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                THEN ' copyright notice all content rights reserved worldwide forever'
                ELSE '' END AS text
  FROM documents WHERE doc_id < 300
),
docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') AS ws
  FROM d
),
wins AS (
  SELECT doc_id, CAST(t.i AS INT) AS start,
         md5(array_to_string(list_slice(ws, t.i + 1, t.i + 8), ' ')) AS wkey
  FROM docs, unnest(range(0, greatest(len(ws) - 7, 0))) AS t(i)
),
dup AS (SELECT wkey FROM wins GROUP BY wkey HAVING count(*) >= 2),
starts AS (
  SELECT doc_id, list_sort(list(DISTINCT start)) AS starts
  FROM wins JOIN dup USING (wkey) GROUP BY doc_id
),
asm AS (
  SELECT docs.doc_id, ws,
         coalesce(starts.starts, CAST([] AS INT[])) AS sts
  FROM docs LEFT JOIN starts USING (doc_id)
),
cov AS (
  SELECT doc_id, ws, sts,
         list_filter(range(0, len(ws)),
                     j -> len(list_filter(sts, s -> s <= j AND j < s + 8)) = 0
         ) AS kept
  FROM asm
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(sts) AS BIGINT) AS n_dup_spans,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
       coalesce(array_to_string(list_transform(kept, j -> ws[j + 1]), ' '), '')
         AS clean_text
FROM cov
"""


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal over the FULL documents table:
    add-one bigram LM trained on the doc_id%5==0 reference slice, every
    document scored by mean bigram log-probability, head/middle/tail
    perplexity buckets. The oracle replays the ENTIRE train->score->
    bucket chain in SQL (counts are exact integers; ln() of exact ratios
    rounded after the mean — the exp/sqrt precedent of text_signals/
    corpus_sampling). History counts and the vocabulary derive from the
    bigram table, so training scans the reference corpus once."""
    from paddle_spark.operators.lm import (
        lm_score,
        ppl_buckets_exact,
        train_bigram_lm,
    )

    d = _t(spark, sf_dir, "documents")
    bi, uni, vocab = train_bigram_lm(d.filter(F.col("doc_id") % 5 == 0))
    return ppl_buckets_exact(lm_score(d, bi, uni, vocab))


_LM_PERPLEXITY_ORACLE = r"""
WITH reft AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w != '') AS ws
  FROM documents WHERE doc_id % 5 = 0
),
bi AS (
  SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2, count(*) AS c12
  FROM reft, unnest(range(1, greatest(len(ws), 1))) AS t(i)
  GROUP BY 1, 2
),
uni AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS v FROM bi),
docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w != '') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id, ws[t.i] AS w1, ws[t.i + 1] AS w2
  FROM docs, unnest(range(1, greatest(len(ws), 1))) AS t(i)
),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(sum(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
                      / CAST(coalesce(c1, 0) + v AS DOUBLE))) / count(*),
               3) AS avg_logprob
  FROM pairs LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1) CROSS JOIN v
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams, avg_logprob,
       CASE least(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id), 3)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM scored
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over the distributed inverted index: three
    fixed probe queries against the documents corpus; the oracle replays
    postings -> df -> idf*tf_norm -> rounded-score ranking verbatim.
    Ranking orders by the ROUNDED score + doc_id so rank order cannot
    diverge on float dust."""
    from paddle_spark.operators.search import bm25_topk

    d = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(0, "table scan merge"), (1, "join order batch"), (2, "hash value stream")],
        "query_id long, query string",
    )
    out = bm25_topk(d, queries, k=5)
    return out.select(
        "query_id",
        F.col("id").alias("doc_id"),
        "score",
        F.col("rk").cast("long").alias("rk"),
    )


_BM25_ORACLE = r"""
WITH docs AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w != '') AS ws
  FROM documents
),
toks AS (SELECT id, unnest(ws) AS term FROM docs),
postings AS (SELECT term, id, count(*) AS tf FROM toks GROUP BY 1, 2),
doc_lens AS (SELECT id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM doc_lens
),
qraw AS (
  SELECT * FROM (VALUES
    (CAST(0 AS BIGINT), 'table scan merge'),
    (CAST(1 AS BIGINT), 'join order batch'),
    (CAST(2 AS BIGINT), 'hash value stream')) AS t(query_id, query)
),
qterms AS (
  SELECT query_id,
         unnest(list_distinct(
           list_filter(string_split_regex(trim(lower(query)), '\s+'),
                       w -> w != ''))) AS term
  FROM qraw
),
probed AS (
  SELECT p.* FROM postings p JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
),
dfreq AS (SELECT term, count(*) AS df FROM probed GROUP BY 1),
scored AS (
  SELECT query_id, id,
         round(sum(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * (1.2 + 1.0)
              / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))), 3) AS score
  FROM probed
  JOIN qterms USING (term)
  JOIN dfreq USING (term)
  JOIN doc_lens USING (id)
  CROSS JOIN stats
  GROUP BY query_id, id
)
SELECT query_id, id AS doc_id, score, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rk
  FROM scored
) WHERE rk <= 5
"""


def q_mm_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF extraction with an EXACT oracle: every field of the planted
    APP1 segments (orientation, camera make/model, capture time, pixel
    dims, ISO, f-number, exposure, signed GPS degrees) is closed-form in
    doc_id, so the oracle rebuilds the expected metadata without parsing
    a byte. doc_id%7==3 plants a plain JPEG (has_exif=false, null
    fields — per-item isolation); doc_id%2!=0 omits the GPS IFD. Floats
    round to 6 in-query on both sides; the d+m/60+s/3600 GPS math runs
    the identical IEEE sequence in the kernel and the SQL."""
    import numpy as np
    import pandas as pd

    from paddle_spark.operators.multimodal import exif_meta
    from paddle_spark.sources.synth import make_exif_jpeg, make_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def to_img(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"].tolist()]
            payloads = []
            for i in ids:
                arr = np.full((8, 8), (i * 31) % 256, dtype=np.uint8)
                if i % 7 == 3:
                    payloads.append(make_jpeg(arr))
                    continue
                gps = None
                if i % 2 == 0:
                    gps = (
                        ("N" if i % 4 == 0 else "S",
                         (i % 90, i % 60, (i * 7) % 60)),
                        ("E" if i % 3 == 0 else "W",
                         (i % 180, (i * 3) % 60, (i * 11) % 60)),
                    )
                payloads.append(make_exif_jpeg(
                    arr,
                    make=f"cam{i % 3}",
                    model=f"M{i % 5}",
                    orientation=1 + i % 8,
                    datetime_s=f"2024:01:02 03:04:0{i % 10}",
                    exposure=(1, 60 + i % 200),
                    f_number=(10 + i % 30, 10),
                    iso=100 * (1 + i % 4),
                    pix_x=100 + i % 50,
                    pix_y=200 + i % 60,
                    gps=gps,
                    big_endian=(i % 5 == 0),
                ))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(to_img, schema="media_id long, payload binary")
    out = exif_meta(media)
    return out.select(
        "media_id", "has_exif", "orientation", "make", "model", "datetime",
        "exif_width", "exif_height", "iso",
        F.round("f_number", 6).alias("f_number"),
        F.round("exposure_time", 6).alias("exposure_time"),
        F.round("gps_lat", 6).alias("gps_lat"),
        F.round("gps_lon", 6).alias("gps_lon"),
    )


_MM_EXIF_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       (doc_id % 7 != 3) AS has_exif,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE CAST(1 + doc_id % 8 AS BIGINT) END AS orientation,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE 'cam' || CAST(doc_id % 3 AS VARCHAR) END AS make,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE 'M' || CAST(doc_id % 5 AS VARCHAR) END AS model,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE '2024:01:02 03:04:0' || CAST(doc_id % 10 AS VARCHAR)
       END AS datetime,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE CAST(100 + doc_id % 50 AS BIGINT) END AS exif_width,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE CAST(200 + doc_id % 60 AS BIGINT) END AS exif_height,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE CAST(100 * (1 + doc_id % 4) AS BIGINT) END AS iso,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE round(CAST(10 + doc_id % 30 AS DOUBLE) / 10.0, 6)
       END AS f_number,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE round(1.0 / CAST(60 + doc_id % 200 AS DOUBLE), 6)
       END AS exposure_time,
       CASE WHEN doc_id % 7 = 3 OR doc_id % 2 != 0 THEN NULL
            ELSE round((CASE WHEN doc_id % 4 = 0 THEN 1.0 ELSE -1.0 END)
                       * (CAST(doc_id % 90 AS DOUBLE)
                          + CAST(doc_id % 60 AS DOUBLE) / 60.0
                          + CAST((doc_id * 7) % 60 AS DOUBLE) / 3600.0), 6)
       END AS gps_lat,
       CASE WHEN doc_id % 7 = 3 OR doc_id % 2 != 0 THEN NULL
            ELSE round((CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE -1.0 END)
                       * (CAST(doc_id % 180 AS DOUBLE)
                          + CAST((doc_id * 3) % 60 AS DOUBLE) / 60.0
                          + CAST((doc_id * 11) % 60 AS DOUBLE) / 3600.0), 6)
       END AS gps_lon
FROM documents WHERE doc_id < 200
"""


_C4_KEEP1 = "the quick data pipeline processes many documents every single day."
_C4_Q = "is this a complete question with enough words to count?"
_C4_DOT = "the table scan works well today."
_C4_JS = "please enable javascript to view the dynamic content here."
_C4_BRACE = "var config = { mode: fast }"
_C4_LOREM = "lorem ipsum dolor sit amet consectetur adipiscing elit now."
_C4_BAD = "this sentence mentions one obscene word in passing today."


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules over planted multi-line pages: the word-salad
    base line (no terminal punctuation) is always line-dropped; planted
    lines exercise every rule — terminal-punct keeps, a <5-word line, a
    javascript line (line-dropped but its '.' still counts toward page
    sentences), a '{' page poison, a lorem-ipsum page poison, and a
    blocklist-word page poison. The oracle replays the identical
    containment/ends-with logic (no regex anywhere)."""
    from paddle_spark.operators.textstats import c4_signals

    d = _t(spark, sf_dir, "documents")
    text2 = F.concat_ws(
        "\n",
        F.col("text"),
        F.lit(_C4_KEEP1),
        F.lit(_C4_Q),
        F.when(F.col("doc_id") % 2 == 0, F.lit(_C4_DOT)),
        F.when(F.col("doc_id") % 4 == 1, F.lit(_C4_JS)),
        F.when(F.col("doc_id") % 5 == 2, F.lit(_C4_BRACE)),
        F.when(F.col("doc_id") % 7 == 3, F.lit(_C4_LOREM)),
        F.when(F.col("doc_id") % 11 == 4, F.lit(_C4_BAD)),
    )
    return c4_signals(d.select("doc_id", text2.alias("text")))


_C4_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         concat_ws(chr(10), text,
           '{_C4_KEEP1}',
           '{_C4_Q}',
           CASE WHEN doc_id % 2 = 0 THEN '{_C4_DOT}' END,
           CASE WHEN doc_id % 4 = 1 THEN '{_C4_JS}' END,
           CASE WHEN doc_id % 5 = 2 THEN '{_C4_BRACE}' END,
           CASE WHEN doc_id % 7 = 3 THEN '{_C4_LOREM}' END,
           CASE WHEN doc_id % 11 = 4 THEN '{_C4_BAD}' END) AS text
  FROM documents
),
s AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)),
           x -> right(trim(x), 1) IN ('.', '!', '?', '"')
                AND len(list_filter(string_split_regex(trim(x), '\s+'),
                                    w -> w != '')) >= 5
                AND NOT contains(lower(x), 'javascript')) AS kept,
         (length(text) - length(replace(text, '.', '')))
         + (length(text) - length(replace(text, '!', '')))
         + (length(text) - length(replace(text, '?', ''))) AS n_sent,
         contains(text, '{{') AS has_brace,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         (contains(lower(text), 'badword') OR contains(lower(text), 'obscene')
          OR contains(lower(text), 'expletive')) AS has_badword
  FROM d
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(n_sent AS BIGINT) AS n_sentences,
       has_brace, has_lorem, has_badword,
       (n_sent >= 3 AND NOT has_brace AND NOT has_lorem AND NOT has_badword)
         AS c4_keep,
       array_to_string(kept, chr(10)) AS kept_text
FROM s
"""


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE train+encode with an EXACT oracle via saturation: the
    synthetic corpus vocabulary is small (31 words, min frequency 26),
    so 500 merges fully collapse every word — training provably
    converges to one token per word, making n_tokens == n_words
    closed-form. The general (unsaturated) algorithm is pinned by
    tests/test_bpe.py against the published Sennrich merge sequence and
    a detokenize round-trip."""
    from paddle_spark.operators.bpe import bpe_encode, train_bpe

    d = _t(spark, sf_dir, "documents")
    merges = train_bpe(d, n_merges=500)
    return bpe_encode(d, merges)


_BPE_ORACLE = r"""
SELECT doc_id AS id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w != '') AS ws
  FROM documents
)
"""


def q_text_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-ranking suite: CCNet-style bigram-LM perplexity bucketing and
    BM25 inverted-index retrieval — the two corpus-scoring workhorses of
    a training-data pipeline (quality gating; contamination forensics /
    targeted sample pulls)."""
    return _suite_frame(spark, sf_dir, [
        ("lm_perplexity", q_lm_perplexity),
        ("bm25_search", q_bm25_search),
    ])


def q_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup suite: exact text dedup (D4, groupBy-rep), last-wins
    key collapse (J5, window rn=1), paragraph-level boilerplate
    removal (CCNet/Dolma-style), ExactSubstr span dedup, and
    Bloom-filter corpus membership (incremental-crawl gate)."""
    return _suite_frame(spark, sf_dir, [
        ("dedup_exact", q_dedup_exact),
        ("dedup_lastwins", q_dedup_lastwins),
        ("paragraph_dedup", q_paragraph_dedup),
        ("span_dedup", q_span_dedup),
        ("bloom_membership", q_bloom_membership),
    ])


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup suite: exact pairwise cosine baseline and the
    banded hyperplane-LSH scale path (planted duplicates make the LSH
    output equal the exact pairwise result — both branches hash-green)."""
    return _suite_frame(spark, sf_dir, [
        ("embedding_cosine", q_dedup_embedding_cosine),
        ("embedding_bucketed", q_dedup_embedding_bucketed),
    ])


def q_string_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/scalar kernel suite — regex extraction, bbox-key
    normalization (X3), data-URI strip (X6), base64 round-trip (X1),
    the HTML strip chain (X4), unicode text normalization
    (hygiene chain + NFC + CCNet hash key, operators/normalize.py),
    and HTML <table> recognition to pipe-table markdown."""
    return _suite_frame(spark, sf_dir, [
        ("regex_extract", q_regex_extract),
        ("key_normalize", q_key_normalize),
        ("data_uri_strip", q_data_uri_strip),
        ("b64_roundtrip", q_b64_roundtrip),
        ("html_strip", q_html_strip),
        ("text_clean", q_text_clean),
        ("html_table", q_html_table),
    ])


def _domain_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a deterministic synthetic URL (23 hosts) plus the
    hashed-linear classifier's (n_tokens, keep) — the per-document inputs
    a domain-level curation stage consumes. Same construction in the
    oracle SQL, so the domain aggregates are hash-checkable end-to-end."""
    from paddle_spark.operators.textstats import hashed_linear_score

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 23).cast("string"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    scored = hashed_linear_score(d).select("doc_id", "n_tokens", "keep")
    return d.select("doc_id", url.alias("url")).join(scored, "doc_id")


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation stats (RefinedWeb-style host gate signal):
    groupBy(host) with integer-only aggregates + one exact long/long
    division — map-side partial agg absorbs host skew (curate.domain_stats)."""
    from paddle_spark.operators.curate import domain_stats

    return domain_stats(_domain_docs(spark, sf_dir))


def q_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving the domain-level bar (host keep-rate >= 0.5 and
    >= 5 observed docs): pre-aggregated stats joined back left-semi by
    host (curate.domain_gate)."""
    from paddle_spark.operators.curate import domain_gate, domain_stats

    docs = _domain_docs(spark, sf_dir)
    stats = domain_stats(docs)
    # keep as 0/1 long: null-padded union suites can't carry booleans
    # (pandas renders the padding NaN on the oracle side)
    return domain_gate(docs, stats, min_docs=5, min_keep_frac=0.5).select(
        "doc_id", "url", "n_tokens", F.col("keep").cast("long").alias("kept")
    )


_DOMAIN_DOCS_SQL = r"""
  SELECT doc_id,
         'https://site' || (doc_id % 23) || '.example.com/doc/' || doc_id AS url,
         'site' || (doc_id % 23) || '.example.com' AS host,
         n_tokens, keep
  FROM (
    SELECT doc_id,
      CAST(len(ws) AS BIGINT) AS n_tokens,
      (1.0/(1.0+exp(-(CASE WHEN len(ws) > 0 THEN 0.0 +
        coalesce(list_sum(list_transform(ws,
          t -> ((('0x' || substring(md5(t),1,8))::BIGINT % 4096) % 197) - 98)), 0)
        /98.0/len(ws) ELSE 0.0 END))) >= 0.5) AS keep
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') AS ws
      FROM documents
    )
  )
"""

_DOMAIN_STATS_ORACLE = f"""
WITH docs AS ({_DOMAIN_DOCS_SQL})
SELECT host,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / count(*), 6) AS keep_frac
FROM docs GROUP BY host
"""

_DOMAIN_GATE_ORACLE = f"""
WITH docs AS ({_DOMAIN_DOCS_SQL}),
good AS (
  SELECT host FROM docs GROUP BY host
  HAVING count(*) >= 5
     AND round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / count(*), 6) >= 0.5
)
SELECT doc_id, url, n_tokens,
       CAST(CASE WHEN keep THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM docs WHERE host IN (SELECT host FROM good)
"""


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-based host quality rank: pages -> outlink harvest -> host
    edge list -> fixed-point integer PageRank (graph.host_rank, 5
    iterations). The whole chain is deterministic long math, so the
    oracle replays the identical unrolled iterations bit-for-bit."""
    from paddle_spark.operators.graph import host_edges, host_rank

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 2000)
    k = F.col("c_custkey")
    url = F.concat(
        F.lit("https://site"), (k % 13).cast("string"),
        F.lit(".example.com/p/"), k.cast("string"),
    )
    html = F.concat(
        F.lit('<p>x</p><a href="https://site'),
        ((k * 5 + 1) % 13).cast("string"),
        F.lit('.example.com/a">l</a> <a href="https://site'),
        ((k * 3 + 7) % 13).cast("string"),
        F.lit('.example.com/b">l</a>'),
    )
    pages = c.select(url.alias("url"), html.alias("text"))
    return host_rank(host_edges(pages), n_iter=5)


def _host_rank_oracle(n_iter: int = 5) -> str:
    """Unrolled fixed-point PageRank twin of graph.host_rank: DuckDB //
    is floor division == Spark's `div` truncation on the non-negative
    longs involved."""
    prev, ctes = "r0", []
    for i in range(1, n_iter + 1):
        ctes.append(f"""r{i} AS (
  SELECT h.host,
         CAST(150000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank_u
  FROM hosts h LEFT JOIN (
    SELECT e.dst AS host, CAST(sum(r.rank_u // o.outdeg) AS BIGINT) AS c
    FROM e JOIN {prev} r ON e.src = r.host JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON h.host = s.host
)""")
        prev = f"r{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH pages AS (
  SELECT 'site' || (c_custkey % 13) || '.example.com' AS src,
         'site' || ((c_custkey * 5 + 1) % 13) || '.example.com' AS d1,
         'site' || ((c_custkey * 3 + 7) % 13) || '.example.com' AS d2
  FROM customer WHERE c_custkey < 2000
),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, d1 AS dst FROM pages UNION ALL SELECT src, d2 FROM pages
  ) WHERE dst != src
),
hosts AS (SELECT DISTINCT src AS host FROM e UNION SELECT DISTINCT dst FROM e),
outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS rank_u FROM hosts),
{chain}
SELECT host, rank_u, round(rank_u / 1000000.0, 6) AS rank FROM {prev}
"""


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt politeness gate end-to-end: per-host robots bodies
    (with comments, an Allow carve-out under a Disallow prefix, and a
    specific-agent group that must NOT apply to '*') parse through the
    window-function parser, then gate a URL frame — longest-match /
    tie-break / default-allow semantics land as a closed-form oracle."""
    from paddle_spark.operators.robots import robots_gate, robots_rules

    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 7)
    h = F.col("n_nationkey")
    body = F.concat(
        F.lit("# corpus politeness\nUser-agent: *\nDisallow: /p"),
        h.cast("string"),
        F.lit("\nAllow: /p"),
        h.cast("string"),
        F.lit("/ok\n\nUser-agent: strictbot\nDisallow: /\n"),
    )
    robots = n.select(
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example.com")).alias("host"),
        body.alias("robots_txt"),
    )
    rules = robots_rules(robots)

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 2000)
    k = F.col("c_custkey")
    path = (
        F.when(k % 3 == 0, F.concat(F.lit("/p"), (k % 7).cast("string"),
                                    F.lit("/x"), k.cast("string")))
        .when(k % 3 == 1, F.concat(F.lit("/p"), (k % 7).cast("string"),
                                   F.lit("/ok/x"), k.cast("string")))
        .otherwise(F.concat(F.lit("/q/x"), k.cast("string")))
    )
    urls = c.select(
        F.concat(F.lit("https://site"), (k % 7).cast("string"),
                 F.lit(".example.com"), path).alias("url"),
    )
    gated = robots_gate(urls, rules, agent="*")
    # boolean -> 0/1 long: null-padded union suites can't carry booleans
    return gated.select("url", F.col("allowed").cast("long").alias("allowed"))


_ROBOTS_GATE_ORACLE = """
SELECT 'https://site' || (c_custkey % 7) || '.example.com' ||
       CASE WHEN c_custkey % 3 = 0
              THEN '/p' || (c_custkey % 7) || '/x' || c_custkey
            WHEN c_custkey % 3 = 1
              THEN '/p' || (c_custkey % 7) || '/ok/x' || c_custkey
            ELSE '/q/x' || c_custkey END AS url,
       CAST(CASE WHEN c_custkey % 3 != 0 THEN 1 ELSE 0 END AS BIGINT) AS allowed
FROM customer WHERE c_custkey < 2000
"""


def q_surt_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index rows over a closed-form synthetic corpus: SURT key
    (host labels reversed + www/port/scheme stripped, params sorted,
    fragment dropped — functions.surt_key_col), 14-digit capture
    timestamp, url, byte length (operators/export.cdx_index; the
    digest column is xxhash64-based and oracled by pytest instead).
    The globally-sorted range-partitioned shard write is pinned by
    tests/test_cdx.py."""
    from paddle_spark.operators.export import cdx_index

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    pages = o.select(
        F.concat(
            F.lit("HTTPS://WWW.Archive"),
            (F.col("o_orderkey") % 9).cast("string"),
            F.lit(".Example.COM:443/Item/"),
            F.col("o_orderkey").cast("string"),
            F.lit("?z=9&a="),
            (F.col("o_orderkey") % 4).cast("string"),
            F.lit("#sec"),
        ).alias("url"),
        F.col("o_orderdate").cast("timestamp").alias("warc_ts"),
        F.concat(F.lit("doc "), F.col("o_orderkey").cast("string")).alias("text"),
    )
    return cdx_index(pages).select("surt", "ts14", "url", "n_bytes")


_SURT_CDX_ORACLE = """
SELECT
  'com,example,archive' || (o_orderkey % 9) || ')/item/' || o_orderkey
    || '?a=' || (o_orderkey % 4) || '&z=9' AS surt,
  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y%m%d%H%M%S') AS ts14,
  'HTTPS://WWW.Archive' || (o_orderkey % 9) || '.Example.COM:443/Item/' ||
    o_orderkey || '?z=9&a=' || (o_orderkey % 4) || '#sec' AS url,
  CAST(strlen('doc ' || o_orderkey) AS INT) AS n_bytes
FROM orders WHERE o_orderkey < 2000
"""


def q_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sitemap.xml parsing (operators/sitemap.py): urlset blocks ->
    (host, kind, loc, lastmod) rows with XML-entity unescape, optional
    lastmod, and whitespace trim — closed-form synthetic bodies so the
    oracle states the expected rows directly."""
    from paddle_spark.operators.sitemap import sitemap_entries

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)
    k = F.col("o_orderkey").cast("string")
    s = (F.col("o_orderkey") % 7).cast("string")
    body = F.concat(
        F.lit("<urlset>\n <url><loc> https://s"), s,
        F.lit(".example.net/page/"), k,
        F.lit("?a=1&amp;b=2 </loc><lastmod>2024-0"),
        ((F.col("o_orderkey") % 9) + 1).cast("string"),
        F.lit("-15</lastmod></url>\n <url><loc>https://s"), s,
        F.lit(".example.net/alt/"), k,
        F.lit("</loc></url>\n <url><priority>0.5</priority></url>\n</urlset>"),
    )
    src = o.select(
        F.concat(F.lit("s"), s, F.lit(".example.net")).alias("host"),
        body.alias("sitemap_xml"),
    )
    return sitemap_entries(src)


_SITEMAP_ORACLE = """
SELECT 's' || (o_orderkey % 7) || '.example.net' AS host, 'url' AS kind,
  'https://s' || (o_orderkey % 7) || '.example.net/page/' || o_orderkey
    || '?a=1&b=2' AS loc,
  '2024-0' || ((o_orderkey % 9) + 1) || '-15' AS lastmod
FROM orders WHERE o_orderkey < 1500
UNION ALL
SELECT 's' || (o_orderkey % 7) || '.example.net' AS host, 'url' AS kind,
  'https://s' || (o_orderkey % 7) || '.example.net/alt/' || o_orderkey AS loc,
  CAST(NULL AS VARCHAR) AS lastmod
FROM orders WHERE o_orderkey < 1500
"""


def q_url_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL suite — canonicalization, outlink extraction, the
    domain-level curation pair (per-host stats + host gate), the
    link-graph host rank, the robots.txt politeness gate, and the
    SURT/CDX web-archive index kernel."""
    return _suite_frame(spark, sf_dir, [
        ("url_canonicalize", q_url_canonicalize),
        ("outlinks", q_outlinks),
        ("domain_stats", q_domain_stats),
        ("domain_gate", q_domain_gate),
        ("host_rank", q_host_rank),
        ("robots_gate", q_robots_gate),
        ("surt_cdx", q_surt_cdx),
        ("sitemap", q_sitemap),
    ])


def q_spatial_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial theta-join suite — overlap (J3) and above (J4), each in
    BOTH forms: the exact theta join (BNLJ at fixture scale) and the
    grid-bucketed scale path (cell equi-join candidates + exact filter,
    provably the same output). One null-padded union frame; the bucketed
    branches share their exact twins' oracles."""
    return _suite_frame(spark, sf_dir, [
        ("overlap_join", q_overlap_join),
        ("overlap_join_bucketed", q_overlap_join_bucketed),
        ("above_join", q_above_join),
        ("above_join_bucketed", q_above_join_bucketed),
    ])


def q_filters_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-family suite — score threshold (F2/F3), minimum size (F5),
    label drop (F6), and staleness TTL (F10/T1)."""
    return _suite_frame(spark, sf_dir, [
        ("score_filter", q_score_filter),
        ("min_size_filter", q_min_size_filter),
        ("label_filter", q_label_filter),
        ("stale_filter", q_stale_filter),
    ])


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order IS the driver's execution order. The driver's
    correctness window has historically capped near 50 rows (r01: 47,
    r02/r03: 50), so single-operator demos are consolidated into
    null-padded union suites (q_relational_core etc.) to keep this
    registry comfortably inside one window — every entry gets a driver
    row every round. Newest / previously-unverified entries still run
    first; two-round-stable entries run last."""
    return {
        # --- NEW NAMES this round (r5) run first ---
        "text_ranking": q_text_ranking,            # NEW: LM perplexity + BM25 top-k
        "mm_exif": q_mm_exif,                      # NEW: EXIF APP1/IFD metadata
        "bpe_tokenize": q_bpe_tokenize,            # NEW: real BPE train+encode
        "c4_filters": q_c4_filters,                # NEW: C4 line/page cleaning rules
        "text_safety": q_text_safety,              # NEW: PII redact + decontaminate
        "corpus_sampling": q_corpus_sampling,      # NEW: hash sample + seq packing
        "job_counters": q_job_counters,            # consolidates counter/status aggs
        "ann_ivf": q_ann_ivf,                      # consolidates assign + refined
        "dedup_planted": q_dedup_planted,          # consolidates minhash/simhash twins
        "dedup_keys": q_dedup_keys,                # consolidates exact + lastwins
        "dedup_embedding": q_dedup_embedding,      # consolidates cosine + bucketed
        "extract_orientation": q_extract_orientation,  # NEW: 0/90/180/270 classify + OCR
        "extract_tables": q_extract_tables,        # NEW: cell grid -> markdown table
        "mm_audio_video": q_mm_audio_video,        # NEW: WAV stats + AVI frame sample
        "dedup_cluster": q_dedup_cluster,          # NEW: pairs -> components -> canonical
        # --- NEW NAMES last round (r4) ---
        "extract_scanned": q_extract_scanned,      # pixels -> boxes -> text
        "extract_scanned_pdf": q_extract_scanned_pdf,  # NEW: scanned PDF fallback
        "mm_visual_features": q_mm_visual_features,  # NEW: dhash + histogram
        "ann_pixel_topk": q_ann_pixel_topk,        # NEW: ANN over pixel features
        "visual_near_dup": q_visual_near_dup,      # NEW: banded dhash Hamming join
        "filters_suite": q_filters_suite,          # F2/F3+F5+F6+F10 consolidated
        "string_kernels": q_string_kernels,        # X1/X3/X4/X6 + regex
        "url_kernels": q_url_kernels,              # canonicalize + outlinks
        "relational_core": q_relational_core,      # Q1/Q5-shape + cube + distinct
        "windows_limits": q_windows_limits,        # top-k/rownum/flags/sets/trunc
        "spatial_joins": q_spatial_joins,          # J3/J4 exact + bucketed twins
        # (mm_decode_stub is retired from the registry: decode_media's
        # plumbing is exactly covered by mm_decode_dims' exact oracle, and
        # its digest feature is superseded by mm_visual_features)
        "mm_decode_dims": q_mm_decode_dims,
        "mm_pixel_stats": q_mm_pixel_stats,        # NEW: real pixel decode, exact oracle
        "mm_frame_sample": q_mm_frame_sample,      # NEW: animated-GIF frame sampling
        "extract_real_pdf": q_extract_real_pdf,    # NEW: exact oracle thru kernels/pdf.py
        "ann_lsh_planted": q_ann_lsh_planted,

        "text_stats": q_text_stats,        # consolidates tokens/quality/fingerprint
        "text_signals": q_text_signals,    # consolidates langid/repetition
        "mm_binary_meta": q_mm_binary_meta,
        "ann_lsh": q_ann_lsh,              # rows-only scale path (multi-probe knob)
        # --- extraction pipeline (flagship + layout branch) ---
        "extract_html": q_extract_html,
        "extract_layout": q_extract_layout,
        "extract_layout_oracle": q_extract_layout_oracle,
        "extract_layout_markdown": q_extract_layout_markdown,
        "extract_blocks": q_extract_blocks,
        "classify_payloads": q_classify_payloads,
        # --- joins ---
        "computed_key_join": q_computed_key_join,
        "left_join_coalesce": q_left_join_coalesce,
        "caption_enrich": q_caption_enrich,
        # --- dedup family (dedup_keys/dedup_planted/dedup_embedding
        #     suites above carry exact/lastwins, the planted twins, and
        #     the embedding cosine/bucketed pair) ---
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "ann_topk": q_ann_topk,
        # --- aggregations (job_counters suite above carries
        #     counter_aggregates + status_aggregation) ---
        "temporal_suite": q_temporal_suite,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "text_ranking": _suite_oracle([
            ("lm_perplexity", _LM_PERPLEXITY_ORACLE),
            ("bm25_search", _BM25_ORACLE),
        ]),
        "mm_exif": _MM_EXIF_ORACLE,
        "bpe_tokenize": _BPE_ORACLE,
        "c4_filters": _C4_ORACLE,
        "extract_orientation": _EXTRACT_ORIENTATION_ORACLE,
        "extract_tables": _tables_oracle(),
        "dedup_cluster": _DEDUP_CLUSTER_ORACLE,
        "mm_audio_video": _suite_oracle([
            ("audio_stats", _AUDIO_STATS_ORACLE),
            ("video_frames", _VIDEO_FRAMES_ORACLE),
            ("container_meta", _CONTAINER_META_ORACLE),
        ]),
        "extract_scanned": _EXTRACT_SCANNED_ORACLE,
        "extract_scanned_pdf": _EXTRACT_SCANNED_PDF_ORACLE,
        "mm_visual_features": _MM_VISUAL_ORACLE,
        "ann_pixel_topk": _ANN_PIXEL_ORACLE,
        "visual_near_dup": _VISUAL_NEAR_DUP_ORACLE,
        "extract_html": _EXTRACT_HTML_ORACLE,
        "extract_real_pdf": _EXTRACT_REAL_PDF_ORACLE,
        "mm_pixel_stats": _MM_PIXEL_STATS_ORACLE,
        "mm_frame_sample": _MM_FRAME_SAMPLE_ORACLE,
        "text_stats": _TEXT_STATS_ORACLE,
        "text_signals": _text_signals_oracle(),
        "extract_layout_oracle": _EXTRACT_LAYOUT_ORACLE,
        "extract_layout_markdown": _EXTRACT_LAYOUT_MD_ORACLE,
        "extract_blocks": _EXTRACT_BLOCKS_ORACLE,
        "classify_payloads": _CLASSIFY_ORACLE,
        "filters_suite": _suite_oracle([
            ("score_filter", _SCORE_FILTER_ORACLE),
            ("min_size_filter", _MIN_SIZE_ORACLE),
            ("label_filter", _LABEL_FILTER_ORACLE),
            ("stale_filter", _STALE_FILTER_ORACLE),
        ]),
        "computed_key_join": _COMPUTED_KEY_JOIN_ORACLE,
        "left_join_coalesce": _LEFT_JOIN_ORACLE,
        "spatial_joins": _suite_oracle([
            ("overlap_join", _OVERLAP_JOIN_ORACLE),
            ("overlap_join_bucketed", _OVERLAP_JOIN_ORACLE),
            ("above_join", _ABOVE_JOIN_ORACLE),
            ("above_join_bucketed", _ABOVE_JOIN_ORACLE),
        ]),
        "dedup_keys": _suite_oracle([
            ("dedup_exact", _DEDUP_EXACT_ORACLE),
            ("dedup_lastwins", _DEDUP_LASTWINS_ORACLE),
            ("paragraph_dedup", _PARAGRAPH_DEDUP_ORACLE),
            ("span_dedup", _SPAN_DEDUP_ORACLE),
            ("bloom_membership", _BLOOM_MEMBERSHIP_ORACLE),
        ]),
        "caption_enrich": _CAPTION_ENRICH_ORACLE,
        "temporal_suite": _suite_oracle([
            ("ordered_concat", _ORDERED_CONCAT_ORACLE),
            ("sessionize", _SESSIONIZE_ORACLE),
            ("time_buckets", _TIME_BUCKETS_ORACLE),
        ]),
        "job_counters": _suite_oracle([
            ("counter_aggregates", _COUNTER_ORACLE),
            ("status_aggregation", _STATUS_AGG_ORACLE),
        ]),
        "text_safety": _suite_oracle([
            ("pii_redact", _pii_oracle()),
            ("decontaminate", _DECONTAMINATE_ORACLE),
        ]),
        "corpus_sampling": _suite_oracle([
            ("hash_sample", _HASH_SAMPLE_ORACLE),
            ("temperature_sample", _TEMPERATURE_SAMPLE_ORACLE),
            ("pack_sequences", _PACK_SEQUENCES_ORACLE),
        ]),
        "relational_core": _suite_oracle([
            ("pricing_summary", _PRICING_ORACLE),
            ("regional_revenue", _REGIONAL_REVENUE_ORACLE),
            ("cube_rollup", _CUBE_ORACLE),
            ("distinct_agg", _DISTINCT_AGG_ORACLE),
            ("shipping_priority", _SHIPPING_PRIORITY_ORACLE),
        ]),
        "windows_limits": _suite_oracle([
            ("topk_per_group", _TOPK_ORACLE),
            ("row_numbering", _ROW_NUMBER_ORACLE),
            ("continuation_flags", _CONTINUATION_ORACLE),
            ("set_ops", _SET_OPS_ORACLE),
            ("truncate", _TRUNCATE_ORACLE),
        ]),
        "string_kernels": _suite_oracle([
            ("regex_extract", _REGEX_EXTRACT_ORACLE),
            ("key_normalize", _KEY_NORMALIZE_ORACLE),
            ("data_uri_strip", _DATA_URI_ORACLE),
            ("b64_roundtrip", _B64_ORACLE),
            ("html_strip", _HTML_STRIP_ORACLE),
            ("text_clean", _text_clean_oracle()),
            ("html_table", _HTML_TABLE_ORACLE),
        ]),
        "url_kernels": _suite_oracle([
            ("url_canonicalize", _URL_CANON_ORACLE),
            ("outlinks", _OUTLINKS_ORACLE),
            ("domain_stats", _DOMAIN_STATS_ORACLE),
            ("domain_gate", _DOMAIN_GATE_ORACLE),
            ("host_rank", _host_rank_oracle()),
            ("robots_gate", _ROBOTS_GATE_ORACLE),
            ("surt_cdx", _SURT_CDX_ORACLE),
            ("sitemap", _SITEMAP_ORACLE),
        ]),
        "dedup_ngram_jaccard": _NGRAM_JACCARD_ORACLE,
        "dedup_embedding": _suite_oracle([
            ("embedding_cosine", _EMB_NEAR_DUP_ORACLE),
            ("embedding_bucketed", _EMB_BUCKETED_ORACLE),
        ]),
        "dedup_planted": _suite_oracle([
            ("minhash_planted", _PLANTED_PAIRS_ORACLE),
            ("simhash_planted", _SIMHASH_PLANTED_ORACLE),
        ]),
        "ann_topk": _ANN_TOPK_ORACLE,
        "ann_ivf": _suite_oracle([
            ("ivf_assign", _IVF_ORACLE),
            ("ivf_refined", _IVF_REFINED_ORACLE),
        ]),
        "ann_lsh_planted": _ANN_LSH_PLANTED_ORACLE,
        "mm_binary_meta": _MM_META_ORACLE,
        "mm_decode_dims": _MM_DECODE_DIMS_ORACLE,
        # rows-only (hash-dependent outputs, not SQL-expressible on
        # arbitrary input): extract_layout, dedup_minhash_lsh,
        # dedup_simhash, ann_lsh. EVERY one has a hash-green exact twin on
        # a constructed input where the algorithm's output is closed-form:
        # extract_layout_oracle/_markdown, dedup_minhash_planted,
        # dedup_simhash_planted, ann_lsh_planted.
    }
