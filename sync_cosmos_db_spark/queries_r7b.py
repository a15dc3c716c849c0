"""Round-7 operator families X166-X177: compression-ratio quality,
NFC normalization audit, Zipf slope, script-mix profile, max
token-run repetition, burst-collapse dedup, session depth/bounce,
transition validity, inactivity/churn, weight-of-evidence encoding,
Jaro-Winkler linkage, and perceptual image dedup (dHash).

No reference counterpart for any of these (SURVEY.md §2.3 — the
reference has no text/event/image analytics); they extend the
LLM-pipeline toolkit the north star mandates: corpus hygiene
(X166/X167/X169/X170), distributional health (X168), event-stream
cleaning and lifecycle (X171-X174), supervised encoding (X175), and
the two fuzzy-matching flavors the dedup/linkage chain still lacked
(X176 names, X177 images).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import fround, query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X166 — zlib compression-ratio quality signal (rows-only: no SQL
# engine exposes a deterministic compressor, so no oracle is possible;
# behavior is pinned by tests/test_r7_ops.py goldens)
# ---------------------------------------------------------------------------

@query("compression_profile_documents")
def compression_profile_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X166 — per-source zlib compression-ratio profile
    (``text.compression_profile``): mean/min/max ratio plus counts in
    the high-redundancy (<0.35) and incompressible (>0.95) tails —
    the classic cheap boilerplate/noise detector.  One Arrow-batched
    ``mapInPandas`` pass + one group reduce; rows-only by design
    (zlib has no SQL twin)."""
    from sync_cosmos_db_spark.operators.text import compression_profile

    docs = load_table(spark, sf_dir, "documents")
    return compression_profile(docs, "source", "doc_id", "text")


# ---------------------------------------------------------------------------
# X167 — Unicode NFC normalization audit
# ---------------------------------------------------------------------------

@query(
    "nfc_audit_documents",
    """
    WITH aug AS (
      SELECT source,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' caf' || 'e' || chr(769)
                  ELSE text END AS text
      FROM documents),
    d AS (SELECT source, text, nfc_normalize(text) AS norm FROM aug)
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN norm <> text THEN 1 ELSE 0 END)::BIGINT
             AS n_changed,
           sum(length(text))::BIGINT AS chars_before,
           sum(length(norm))::BIGINT AS chars_after
    FROM d GROUP BY 1
    """,
)
def nfc_audit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167 — NFC normalization audit (``text.nfc_audit``) over the
    documents corpus with a deterministic decomposed-form injection
    (every 7th doc gains a combining-acute ``e`` + U+0301 suffix on
    BOTH engines, since the synthetic corpus is pure ASCII): per
    source, how many documents change under NFC and the codepoint
    delta.  The Spark side normalizes with Python ``unicodedata``;
    the oracle with DuckDB's native ``nfc_normalize`` — two
    independent Unicode implementations hash-agreeing."""
    from sync_cosmos_db_spark.operators.text import nfc_audit

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" cafe\u0301")))
        .otherwise(F.col("text")))
    return nfc_audit(aug, "source", "text")


# ---------------------------------------------------------------------------
# X168 — Zipf rank-frequency slope
# ---------------------------------------------------------------------------

@query(
    "zipf_slope_sources",
    """
    WITH toks AS (
      SELECT source AS g, unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    freq AS (SELECT g, tok, count(*)::BIGINT AS f
             FROM toks WHERE tok <> '' GROUP BY 1, 2),
    ranked AS (
      SELECT g, ln(row_number() OVER (PARTITION BY g
                                      ORDER BY f DESC, tok ASC)) AS x,
             ln(f) AS y,
             row_number() OVER (PARTITION BY g
                                ORDER BY f DESC, tok ASC) AS r
      FROM freq),
    top AS (SELECT g, x, y FROM ranked WHERE r <= 100),
    s AS (SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x*x) AS sxx, sum(x*y) AS sxy
          FROM top GROUP BY 1)
    SELECT g AS source, n::BIGINT AS n_ranks,
           floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 10000 + 0.5)
             / 10000 AS slope,
           floor((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n
                 * 10000 + 0.5) / 10000 AS intercept
    FROM s
    """,
)
def zipf_slope_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X168 — Zipf rank-frequency slope per source
    (``text.zipf_slope``): OLS of ln(freq) on ln(rank) over the top
    100 token ranks — natural text sits near -1, boilerplate
    flattens.  One token-keyed count shuffle + a WindowGroupLimit'd
    per-group rank + closed-form OLS on <=100 points per group."""
    from sync_cosmos_db_spark.operators.text import zipf_slope

    docs = load_table(spark, sf_dir, "documents")
    return zipf_slope(docs, "source", "text", top_ranks=100)


# ---------------------------------------------------------------------------
# X169 — Unicode script-mix profile
# ---------------------------------------------------------------------------

@query(
    "script_mix_documents",
    """
    WITH aug AS (
      SELECT source,
             text || CASE WHEN doc_id % 11 = 0 THEN ' Привет мир'
                          ELSE '' END
                  || CASE WHEN doc_id % 13 = 0 THEN ' 中文 123'
                          ELSE '' END AS text
      FROM documents),
    d AS (
      SELECT source,
             len(regexp_extract_all(text, '[\\p{Latin}]')) AS lat,
             len(regexp_extract_all(text, '[\\p{Cyrillic}]')) AS cyr,
             len(regexp_extract_all(text, '[\\p{Han}]')) AS han,
             len(regexp_extract_all(text, '[0-9]')) AS dig,
             (length(text)
              - len(regexp_extract_all(text, '\\s')))::DOUBLE AS nw
      FROM aug)
    SELECT source, count(*)::BIGINT AS n_docs,
           floor(sum(lat) / sum(nw) * 10000 + 0.5) / 10000
             AS latin_share,
           floor(sum(cyr) / sum(nw) * 10000 + 0.5) / 10000
             AS cyrillic_share,
           floor(sum(han) / sum(nw) * 10000 + 0.5) / 10000
             AS han_share,
           floor(sum(dig) / sum(nw) * 10000 + 0.5) / 10000
             AS digit_share,
           sum(CASE WHEN lat > 0 AND cyr > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_mixed_script
    FROM d GROUP BY 1
    """,
)
def script_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X169 — Unicode script-mix profile per source
    (``text.script_mix_profile``) with deterministic Cyrillic/Han
    injections (every 11th / 13th doc) so the shares are non-trivial
    over the ASCII synthetic corpus: Latin/Cyrillic/Han/digit shares
    of non-whitespace characters plus the mixed-script
    (homoglyph-risk) document count.  In-row Java ``\\p{IsLatin}``
    regex counts vs the oracle's RE2 ``\\p{Latin}`` — two regex
    engines' Unicode script tables hash-agreeing."""
    from sync_cosmos_db_spark.operators.text import script_mix_profile

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" Привет мир"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" 中文 123"))
            .otherwise(F.lit(""))))
    return script_mix_profile(aug, "source", "text")


# ---------------------------------------------------------------------------
# X170 — max consecutive identical-token run
# ---------------------------------------------------------------------------

@query(
    "max_token_run_documents",
    """
    WITH toks AS (
      SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> '') AS arr
            FROM documents)),
    runs AS (
      SELECT doc_id, tok, pos,
             pos - row_number() OVER (PARTITION BY doc_id, tok
                                      ORDER BY pos) AS grp
      FROM toks),
    sized AS (
      SELECT doc_id, tok, count(*)::BIGINT AS run_len,
             min(pos) AS start_pos
      FROM runs GROUP BY doc_id, tok, grp),
    best AS (
      SELECT doc_id, tok, run_len,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY run_len DESC, start_pos ASC)
               AS rn
      FROM sized),
    n AS (SELECT doc_id, count(*)::BIGINT AS n_tokens FROM toks
          GROUP BY 1)
    SELECT d.doc_id AS id, coalesce(n.n_tokens, 0) AS n_tokens,
           b.tok AS max_run_token, coalesce(b.run_len, 0) AS max_run_len
    FROM documents d
    LEFT JOIN n ON n.doc_id = d.doc_id
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = d.doc_id
    """,
)
def max_token_run_documents(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X170 — longest consecutive identical-token run per document
    (``text.max_token_run``): the burst-repetition detector Gopher's
    corpus-level fractions can miss.  Spark side is ONE sequential
    ``F.aggregate`` fold per document over the token array — in-row,
    zero shuffle, no explode; the oracle rebuilds the runs with the
    gaps-and-islands construction and takes the earliest maximal
    run, which is exactly what the fold keeps."""
    from sync_cosmos_db_spark.operators.text import max_token_run

    docs = load_table(spark, sf_dir, "documents")
    return max_token_run(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# X171 — burst-collapse event dedup
# ---------------------------------------------------------------------------

@query(
    "burst_collapse_events",
    """
    WITH g AS (
      SELECT event_type, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 300 * 1000000
                  THEN 1 ELSE 0 END AS new_b
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id))
    SELECT event_type, count(*)::BIGINT AS n_events,
           sum(new_b)::BIGINT AS n_kept,
           (count(*) - sum(new_b))::BIGINT AS n_dropped
    FROM g GROUP BY 1
    """,
)
def burst_collapse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X171 — burst-collapse dedup audit
    (``behavioral.burst_collapse``, 5-minute tolerance): per event
    type, how many events survive when consecutive same-(user, type)
    events under 300 s apart collapse to their first — the
    double-click / retry-storm cleaner.  One (user, type)-keyed
    window shuffle; the oracle replays the identical gaps-and-islands
    construction in integer microseconds."""
    from sync_cosmos_db_spark.operators.behavioral import burst_collapse

    ev = load_table(spark, sf_dir, "events")
    kept = burst_collapse(ev, ["user_id", "event_type"], "ts",
                          "event_id", tolerance_seconds=300)
    totals = (ev.groupBy("event_type")
              .agg(F.count("*").cast("long").alias("n_events")))
    kept_c = (kept.groupBy("event_type")
              .agg(F.count("*").cast("long").alias("n_kept")))
    return (totals.join(kept_c, "event_type")
            .select("event_type", "n_events", "n_kept",
                    (F.col("n_events") - F.col("n_kept")).cast("long")
                    .alias("n_dropped")))


# ---------------------------------------------------------------------------
# X172 — session depth / bounce profile
# ---------------------------------------------------------------------------

@query(
    "session_depth_events",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS session_idx
      FROM marked),
    r AS (
      SELECT user_id, session_idx, event_type,
             row_number() OVER (PARTITION BY user_id, session_idx
                                ORDER BY ts, event_id) AS rn
      FROM s),
    depths AS (
      SELECT user_id, session_idx, count(*)::BIGINT AS depth
      FROM s GROUP BY 1, 2),
    per_sess AS (
      SELECT d.depth, r.event_type AS entry_type
      FROM depths d JOIN r
        ON r.user_id = d.user_id AND r.session_idx = d.session_idx
       AND r.rn = 1)
    SELECT entry_type, count(*)::BIGINT AS n_sessions,
           sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_bounce,
           floor(avg(CASE WHEN depth = 1 THEN 1.0 ELSE 0.0 END)
                 * 10000 + 0.5) / 10000 AS bounce_rate,
           floor(avg(depth) * 10000 + 0.5) / 10000 AS mean_depth,
           floor(quantile_cont(depth, 0.9) * 10000 + 0.5) / 10000
             AS p90_depth
    FROM per_sess GROUP BY 1
    """,
)
def session_depth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X172 — session depth / bounce profile by entry event type
    (``behavioral.session_depth_profile``, 30-min gap): session
    count, bounce rate, mean and p90 depth per landing event type.
    The session collapse rides the sessionizer's (user, ts, id) sort;
    the oracle rebuilds the same sessions and elects the entry type
    with ``arg_min`` over the same (ts, id) order."""
    from sync_cosmos_db_spark.operators.behavioral import (
        session_depth_profile,
    )

    ev = load_table(spark, sf_dir, "events")
    out = session_depth_profile(ev, gap_seconds=1800)
    return out.select("entry_type", "n_sessions", "n_bounce",
                      "bounce_rate", "mean_depth",
                      fround("p90_depth", 4).alias("p90_depth"))


# ---------------------------------------------------------------------------
# X173 — state-transition validity audit
# ---------------------------------------------------------------------------

_ALLOWED_TRANSITIONS = [
    ("signup", "view"), ("view", "view"), ("view", "click"),
    ("click", "view"), ("click", "click"), ("click", "purchase"),
    ("purchase", "view"), ("error", "view"),
]


@query(
    "transition_audit_events",
    """
    WITH pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS f,
             event_type AS t
      FROM events)
    SELECT f AS from_state, t AS to_state, count(*)::BIGINT AS n,
           concat(f, ' ', t) IN ('signup view', 'view view',
                                 'view click', 'click view',
                                 'click click', 'click purchase',
                                 'purchase view', 'error view')
             AS is_allowed
    FROM pairs WHERE f IS NOT NULL GROUP BY 1, 2
    """,
)
def transition_audit_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X173 — transition validity audit
    (``behavioral.transition_validity_audit``): every observed
    per-user (from, to) event transition counted and flagged against
    the allowed state machine — sequence-level referential integrity
    (a purchase with no preceding click is a tracking bug or fraud).
    One lag window + one pair count; |types|² output rows."""
    from sync_cosmos_db_spark.operators.behavioral import (
        transition_validity_audit,
    )

    ev = load_table(spark, sf_dir, "events")
    return transition_validity_audit(ev, _ALLOWED_TRANSITIONS)


# ---------------------------------------------------------------------------
# X174 — inactivity / churn profile
# ---------------------------------------------------------------------------

@query(
    "inactivity_profile_events",
    """
    WITH last AS (SELECT user_id, max(ts) AS l FROM events GROUP BY 1),
    hwm AS (SELECT max(ts) AS h FROM events),
    g AS (SELECT floor((epoch_us(h) - epoch_us(l))
                       / 86400000000)::BIGINT AS gap
          FROM last, hwm)
    SELECT CASE WHEN gap <= 1 THEN '<=1d'
                WHEN gap <= 7 THEN '<=7d'
                ELSE '>7d' END AS bucket,
           count(*)::BIGINT AS n_keys,
           min(gap) AS min_gap_days, max(gap) AS max_gap_days
    FROM g GROUP BY 1
    """,
)
def inactivity_profile_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X174 — churn / inactivity profile
    (``behavioral.inactivity_profile``, bands [1, 7] days): users
    bucketed by days between their last event and the corpus
    high-water mark — the lifecycle segmentation (active / lapsed /
    churned).  One user-keyed max + a broadcast 1-row high-water
    mark (the X94 TTL shape)."""
    from sync_cosmos_db_spark.operators.behavioral import (
        inactivity_profile,
    )

    ev = load_table(spark, sf_dir, "events")
    return inactivity_profile(ev, [1, 7])


# ---------------------------------------------------------------------------
# X175 — weight-of-evidence encoding
# ---------------------------------------------------------------------------

@query(
    "woe_orderpriority_returned",
    """
    WITH per_cat AS (
      SELECT o_orderpriority AS category, count(*)::BIGINT AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
               AS n_good
      FROM orders GROUP BY 1),
    wc AS (SELECT *, (n - n_good)::BIGINT AS n_bad FROM per_cat),
    tot AS (SELECT sum(n_good) AS gt, sum(n_bad) AS bt FROM wc),
    j AS (SELECT wc.*, (n_good + 0.5) / (gt + 1.0) AS gs,
                 (n_bad + 0.5) / (bt + 1.0) AS bs
          FROM wc, tot)
    SELECT category, n, n_good, n_bad,
           floor(ln(gs / bs) * 1000000 + 0.5) / 1000000 AS woe,
           floor((gs - bs) * ln(gs / bs) * 1000000 + 0.5) / 1000000
             AS iv_contrib
    FROM j
    """,
)
def woe_orderpriority_returned(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X175 — weight-of-evidence encoding
    (``profiling.woe_encoding``): WOE and information-value
    contribution of ``o_orderpriority`` for predicting finalized
    orders (``o_orderstatus = 'F'``), Laplace-smoothed — the
    log-odds supervised encoder beside the X127 m-estimate mean
    encoder.  One category aggregate + a broadcast 1-row totals
    crossJoin (the X73 chi-square shape)."""
    from sync_cosmos_db_spark.operators.profiling import woe_encoding

    orders = load_table(spark, sf_dir, "orders")
    return woe_encoding(orders, "o_orderpriority",
                        (F.col("o_orderstatus") == "F").cast("long"))


# ---------------------------------------------------------------------------
# X176 — Jaro-Winkler fuzzy linkage
# ---------------------------------------------------------------------------

@query(
    "jaro_winkler_customers",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           floor(jaro_winkler_similarity(a.c_name, b.c_name)
                 * 1000000 + 0.5) / 1000000 AS sim
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.962
    """,
)
def jaro_winkler_customers(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X176 — Jaro-Winkler fuzzy self-join
    (``linkage.jaro_winkler_join``): same-nation customer-name pairs
    with JW similarity >= 0.962 — the transposition-tolerant,
    prefix-boosted name matcher (TPC-H names share the 9-char
    ``Customer#`` prefix, so this corpus is exactly the adversarial
    shared-prefix shape X119 measured; the block + high threshold is
    the operator's declared contract, mirrored in the oracle).  The
    Python scorer is verified bit-identical to DuckDB's
    ``jaro_winkler_similarity`` on 8,000 randomized pairs."""
    from sync_cosmos_db_spark.operators.linkage import jaro_winkler_join

    cust = load_table(spark, sf_dir, "customer")
    return jaro_winkler_join(cust, "c_custkey", "c_name",
                             ["c_nationkey"], threshold=0.962)


# ---------------------------------------------------------------------------
# X177 — perceptual image dedup (dHash) — rows-only: PNG decode +
# bit-level hashing has no SQL twin; goldens in tests/test_r7_ops.py
# ---------------------------------------------------------------------------

@query("dhash_image_clusters")
def dhash_image_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X177 — perceptual near-duplicate image clustering: synthesize
    one REAL gradient PNG per document with the pattern seed
    ``doc_id % 40`` (so exact cluster sizes are deterministic),
    dHash-fingerprint each through the real stdlib decoder
    (``multimodal.dhash_png_assets``), and report the cluster-size
    histogram ``(cluster_size, n_clusters)`` — the image twin of
    X1's exact-hash text dedup.  All per-asset work is one
    Arrow-batched ``mapInPandas`` (encode) + one (decode+hash);
    the only shuffles key on the 64-bit fingerprint."""
    from sync_cosmos_db_spark.operators.multimodal import (
        dhash_png_assets, png_encode,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (F.col("doc_id") % 40).alias("seed"))

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for a, s in zip(pdf["asset_id"], pdf["seed"]):
                w, h = 24, 16
                px = bytes(((x * 7 + y * 13 + int(s) * 31 + c * 5) % 256)
                           for y in range(h) for x in range(w)
                           for c in range(3))
                out.append((a, png_encode(w, h, (0, 0, 0), pixels=px)))
            yield pd.DataFrame(out, columns=["asset_id", "content"])

    assets = docs.mapInPandas(synth, "asset_id long, content binary")
    hashed = dhash_png_assets(assets).filter(F.col("decode_ok"))
    clusters = (hashed.groupBy("dhash")
                .agg(F.count("*").cast("long").alias("cluster_size")))
    return (clusters.groupBy("cluster_size")
            .agg(F.count("*").cast("long").alias("n_clusters"))
            .orderBy("cluster_size"))
