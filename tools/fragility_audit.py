"""Doctored-fixture fragility audit: engine-vs-oracle differentials on
inputs the REAL fixtures never exercise, so latent contract divergences
surface before a fixture regeneration (or real data) does.

Two ADVICE-class input families (both flagged in round 12):

- ``ws``  — whitespace variety in ``documents.text`` (tabs, newlines,
  double spaces).  The real fixtures are single-space-only, so an
  oracle tokenizing with ``string_split(text, ' ')`` silently matches
  an engine tokenizing on ``\\s+`` … until the text changes.  Round 13
  found and fixed six such oracles (build_vocab, jaccard_prefix_join,
  rare_tokens, bm25_search, naive_bayes, latex_strip — plus ADVICE's
  own oov_rate).
- ``neg`` — negative ``events.value``.  The real fixtures bottom out
  at 0.0, so floor-vs-trunc integer-division divergences (the ADVICE
  r11/r12 back-and-forth) are invisible on them.
- ``edge`` — boundary documents: empty text, whitespace-only text,
  single-token text (NO nulls — see below).  Round 13's first run
  found two divergences, both oracle-side: DuckDB
  ``array_to_string([])`` is NULL where Spark's ``concat_ws`` is
  ``''`` (augment_dropout), and the mbox reader's trailing-newline
  rstrip (mbox_extract).
- ``uni`` — non-ASCII text (umlauts, ß, CJK, emoji) mixed into
  ``documents.text``, probing JVM-vs-DuckDB case-folding, length,
  and hash semantics.  Clean on first run (round 13, 24/24) — kept
  as a regression gate.

NULL-text contract (ADOPTED round 14, after the round-13 audit found
44 pairings diverging on NULL ``documents.text`` alone): per-document
metrics propagate NULL (token counters use NULL-propagating
``array_size``, never legacy ``size``'s -1), exploding/tokenizing
operators emit no rows for a NULL document (``tokens_ws(NULL)`` is
NULL, so ``explode`` produces nothing), and media/codec builders RAISE
on a NULL payload (silently nulling a corrupt blob hides data loss).
The ``null`` mode below regression-gates all three clauses.

Each mode builds a doctored copy of ONE table under
``.tmp/fragility/<mode>/`` (all other tables symlinked read-only from
sf0.001), then runs ``tools/check_correctness.py`` over the
input-sensitive query subset.  Engine and oracle see the SAME doctored
data, so any FAIL is a genuine contract divergence, not a wrong
fixture.

Vertical-tab boundary (found round 13, FIXED round 14): Java's
``\\s`` (engine, tokens_ws) matches vertical tab 0x0B; RE2's ``\\s``
(DuckDB) does NOT (verified live: ``regexp_matches(chr(11), '\\s')``
is false, while Spark splits on it).  Round 14 replaced every ``\\s``
in the DuckDB oracles — split, collapse, and negated punct classes —
with the explicit Java-semantics class ``[ \\t\\n\\x0b\\f\\r]``, and
the ws doctoring below now injects VT bytes so the parity is
regression-gated rather than argued.

- ``zero`` — zero-row slices of every table family (``documents``,
  ``events``, ``embeddings``, ``lineitem``, ``orders``, ``customer``,
  and ``part``+``supplier`` together), schema preserved.  A
  partition-pruned read on a real cluster is routinely empty;
  operators must neither crash (driver-side ``collect()[0]``, 0/0
  sampling fractions) nor diverge from the oracle on empty input, and
  sink roundtrips must survive writing-then-reading an empty relation.

Usage: python tools/fragility_audit.py [ws|neg|edge|uni|null|zero|all]
"""

from __future__ import annotations

import os

# Long single-JVM sweeps need the 16g heap (VERDICT r12 #1); the
# library default is 4g, so sweep entry points scope the bump here.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Token-/text-sensitive queries (consume documents.text).
WS_QUERIES = """
word_stats line_dedup repetition_signals build_vocab
jaccard_prefix_join html_extract rare_tokens bm25_search
hashed_features naive_bayes oov_rate token_counts text_quality
top_ngrams tfidf_top_terms token_entropy language_id readability
normalize_text quality_filter collocations term_burstiness heaps_law
good_turing zipf_fit skipgram_pairs chunk_documents latex_strip
bpe_fertility markdown_strip
""".split()

#: Value-aggregating queries (consume events.value) whose integer
#: fixed-point divisions could diverge floor-vs-trunc on negatives.
NEG_QUERIES = """
zscore winsorize mad_outliers iqr_outliers grouped_median
grouped_quantiles histogram quantile_bins decayed_sum ewma_smooth
daily_anomalies benford cusum_shift twap ohlc seasonality
distribution_drift skew_report quantile_normalize anova_f
streaming_user_stats mann_whitney ks_test bootstrap_ci jackknife_se
permutation_test theil_sen spearman kendall_tau corr_matrix
ips_eval cuped_eval streaming_ewma herfindahl_index
""".split()


def _stage(mode: str, doctor_sql: str, table) -> str:
    doctored = (table,) if isinstance(table, str) else tuple(table)
    out = os.path.join(REPO, ".tmp", "fragility", mode)
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t in doctored:
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
    con = duckdb.connect()
    for stmt in doctor_sql.format(base=BASE, out=out).split(";"):
        if stmt.strip():
            con.execute(stmt)
    return out


def _run(sf_dir: str, queries: list[str]) -> int:
    return subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_correctness.py"),
            sf_dir,
            *queries,
        ],
        cwd=REPO,
    )


def audit_ws() -> int:
    sf = _stage(
        "ws",
        """
COPY (
  SELECT * REPLACE (
    CASE
      WHEN doc_id % 3 = 0 THEN replace(text, ' ', chr(9))
      WHEN doc_id % 5 = 0
        THEN concat(substr(text, 1, 20), chr(10), substr(text, 21))
      WHEN doc_id % 7 = 0 THEN replace(text, ' ', '  ')
      WHEN doc_id % 19 = 0 THEN replace(text, ' ', chr(11))
      ELSE text
    END AS text)
  FROM '{base}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""",
        "documents",
    )
    return _run(sf, WS_QUERIES)


def audit_neg() -> int:
    # Flip the sign of ~1/3 of event values (deterministic by id) and
    # shift another band below zero, so sums, medians, and quantile
    # cuts all cross zero.
    sf = _stage(
        "neg",
        """
COPY (
  SELECT * REPLACE (
    CASE
      WHEN event_id % 3 = 0 THEN -value
      WHEN event_id % 5 = 0 THEN value - 500.0
      ELSE value
    END AS value)
  FROM '{base}/events.parquet'
) TO '{out}/events.parquet' (FORMAT PARQUET)
""",
        "events",
    )
    return _run(sf, NEG_QUERIES)


def audit_edge() -> int:
    # Boundary documents: empty / whitespace-only / single-token text.
    # Deliberately NO nulls (see the module docstring).  Runs the full
    # per-document text family PLUS the two queries the first edge run
    # caught (mbox_extract, augment_dropout) and the other doc
    # consumers that passed, as regression cover.
    sf = _stage(
        "edge",
        """
COPY (
  SELECT * REPLACE (
    CASE
      WHEN doc_id % 11 = 0 THEN ''
      WHEN doc_id % 13 = 0 THEN '   '
      WHEN doc_id % 17 = 0 THEN 'single'
      ELSE text
    END AS text)
  FROM '{base}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""",
        "documents",
    )
    return _run(
        sf,
        WS_QUERIES
        + ["mbox_extract", "augment_dropout", "fingerprints",
           "simhash_expr", "unicode_normalize", "select_until_budget",
           "bucketed_packs", "remove_duplicate_spans", "gini_gain",
           "ngram_model_score", "media_sniff"],
    )


def audit_uni() -> int:
    sf = _stage(
        "uni",
        """
COPY (
  SELECT * REPLACE (
    CASE
      WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'ä')
      WHEN doc_id % 5 = 0 THEN text || ' Straße 中文 naïve'
      WHEN doc_id % 7 = 0 THEN 'ÉMOJI 🚀 ' || text
      ELSE text
    END AS text)
  FROM '{base}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""",
        "documents",
    )
    return _run(
        sf,
        ["word_stats", "build_vocab", "jaccard_prefix_join",
         "rare_tokens", "bm25_search", "naive_bayes", "oov_rate",
         "token_counts", "text_quality", "top_ngrams",
         "tfidf_top_terms", "token_entropy", "language_id",
         "readability", "normalize_text", "quality_filter",
         "collocations", "heaps_law", "zipf_fit", "latex_strip",
         "unicode_normalize", "fingerprints", "simhash_expr",
         "charset_sniff"],
    )


#: Queries exercised by the null-text mode: the per-document metric
#: family (must propagate NULL, never legacy size's -1) and the
#: exploding/tokenizing family (must emit no rows for a NULL doc).
#: Media/codec builder queries are deliberately EXCLUDED from the
#: differential — the round-14 contract is that they RAISE on a NULL
#: payload (asserted separately below), since silently dropping or
#: nulling a corrupt blob hides pipeline data loss.
NULL_QUERIES = WS_QUERIES + [
    "fingerprints", "simhash_expr", "simhash", "simhash_pairs",
    "minhash_signatures", "select_until_budget", "bucketed_packs",
    "remove_duplicate_spans", "duplicate_spans", "span_dup_stats",
    "ngram_model_score", "gini_gain", "doc_features", "augment_dropout",
]


def audit_null() -> int:
    # Round-14 NULL-text contract: a band of NULL documents.text.
    # Per-doc metrics propagate NULL, exploding operators emit no
    # rows, media builders raise.
    sf = _stage(
        "null",
        """
COPY (
  SELECT * REPLACE (
    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS text)
  FROM '{base}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""",
        "documents",
    )
    rc = _run(sf, NULL_QUERIES)
    rc |= _assert_media_raises(sf)
    return rc


#: Extra documents-consumers for the zero-row mode beyond the text
#: metric family: dedup, sampling/mix, and split operators whose
#: driver-side constants (thresholds, fractions, cuts) come FROM the
#: data and so can divide-by-zero or index-error on an empty slice.
ZERO_DOC_EXTRA = [
    "exact_dup_groups", "dedup_report", "dedup_keep_best",
    "minhash_lsh_pairs", "cross_source_dups", "url_dedup",
    "corpus_report", "charset_sniff", "mix_sources",
    "temperature_mix", "hash_split", "embargo_split",
]

#: Extra events-consumers for the zero-row mode beyond the stats
#: family: sessionization, funnels, and calendar-spine operators whose
#: min/max-derived date ranges become NULL on empty input.
ZERO_EVT_EXTRA = [
    "sessionize", "session_window", "funnel", "attribution",
    "cohort_retention", "gaps_islands", "sequence_gaps",
    "heavy_hitters", "hll_distinct", "running_distinct",
    "tumbling_window", "sliding_window", "lag_features",
    "holt_forecast", "stl_decompose", "acf_daily",
]


#: Every embeddings-consumer: the ANN / clustering / reduction family,
#: whose greedy seeds, centroid inits, and quantile probes are the
#: likeliest driver-side empty-input crashes.
ZERO_EMB_QUERIES = """
ann_brute_force ann_ivf ann_ivf_indexed ann_lsh ann_lsh_multi ann_mrr
ann_ndcg ann_recall ann_rrf bitext_mine centroid_novelty
density_clusters embedding_dim_profile embedding_near_dup
facility_location hybrid_search ivf_pq_search kcenter_coreset
kmeans_assign kmeans_train lof_outliers matryoshka_eval
maxsim_retrieval pca_project power_iteration pq_encode pq_search
quantize_embeddings semantic_dedup
""".split()


#: Every lineitem-consumer: the TPC-H analytics family plus the
#: lineitem-derived graph/stats operators — probes normal-equation /
#: covariance driver constants (int(NULL)), iterative operators on an
#: empty edge set, and agg-on-empty row-count parity.
ZERO_LI_QUERIES = """
allen_relations approx_quantile_contract argmin_agg below_avg_filter
benford bfs_hops bloom_semi_join bootstrap_ci cms_frequency
composite_key_join corr_matrix count_distinct_agg cube_agg
disjunctive_pred exists_subquery fixed_width_roundtrip fk_containment
forecast_revenue frequent_pairs global_rank graph_assortativity
grouping_sets herfindahl_index hits_scores important_parts k_core
kendall_tau kmv_distinct label_propagation link_prediction
local_supplier_volume market_share min_cost_supplier
pagerank parquet_stats pricing_summary
priority_shipmode product_profit promo_revenue promo_suppliers
returned_items rollup salted_join shipping_priority spearman
sql_interface top1_per_group top_supplier topk_per_group
triangle_count unpivot volume_shipping waiting_suppliers
""".split()

#: Every orders-consumer (oracle-level `FROM/JOIN orders` scan): the
#: order-level analytics, the calendar-spine forecasters whose
#: min/max date ranges go NULL, and — deliberately — the sink
#: ROUNDTRIPS (CTAS, MERGE, WAP, sqlite/xlsx), which must write an
#: empty relation and read it back without losing the schema.
ZERO_ORD_QUERIES = """
acf_daily constraint_violations ctas_roundtrip customer_distribution
exists_subquery fk_containment gaps_islands golden_record
grouped_median having_filter holt_forecast jackknife_se ks_test
link_prediction local_supplier_volume luhn_mask mann_whitney
market_share mase_eval merge_upsert null_safe_join outer_join_agg
permutation_test pivot priority_shipmode product_profit profile_table
returned_items scalar_subquery schema_drift semi_anti_join
sequence_gaps shipping_priority sqlite_roundtrip stl_decompose
theil_sen volume_shipping waiting_suppliers wap_publish
weighted_topk_sample window_analytics woe_encoding xlsx_roundtrip
xml_shred
""".split()

#: Every customer-consumer: the geo family (empty probe side of the
#: broadcast BNLJ), anonymization cuts (k-anonymity thresholds from
#: data), format roundtrips, and the streaming dim-enrich twin.
ZERO_CUST_QUERIES = """
arrow_ipc_roundtrip avro_roundtrip closest_stations
closest_stations_grid constraint_violations customer_distribution
distinct fd_check fs_weights geohash_tiles having_filter hilbert_key
k_anonymity local_supplier_volume market_share ntile_windows
order_by_limit outer_join_agg point_in_polygon record_linkage
returned_items scalar_subquery semi_anti_join set_ops
shipping_priority sorted_neighborhood streaming_enrich t_closeness
target_encode volume_shipping zorder_key zstd_roundtrip
""".split()

#: part+supplier consumers not already exercised above — both dims
#: emptied in ONE stage (empty dimension == empty broadcast side).
ZERO_DIM_QUERIES = """
bloom_semi_join cleaning_scalars cms_frequency csv_roundtrip
disjunctive_pred frequent_pairs fuzzy_join herfindahl_index
jdbc_roundtrip min_cost_supplier orc_roundtrip pareto_front
promo_revenue promo_suppliers salted_join skyline top_supplier
""".split()

#: Global-fit queries excluded from the zero_li differential: the
#: adopted contract is that a degenerate fit RAISES (empty input ==
#: constant feature == collinear design — there is nothing to fit, and
#: a NULL coefficient row would silently poison downstream joins).
#: Asserted raise-side below, the media-raise pattern.
ZERO_LI_RAISING = ["ols_regression", "mahalanobis"]


def audit_zero() -> int:
    # Zero-row input slices.  On a 1000-executor cluster a
    # partition-pruned read (one tenant, one day, one shard) is
    # ROUTINELY empty; an operator that crashes (driver-side
    # ``collect()[0]``, 0/0 in a sampling fraction) or diverges from
    # the oracle (global agg emitting a row vs none) on empty input is
    # a scale bug the non-empty fixtures can never surface.  Schema is
    # preserved (``WHERE false`` COPY keeps the parquet schema), so
    # every plan still resolves — only the row count is zero.
    rc = 0
    sf = _stage(
        "zero_docs",
        """
COPY (
  SELECT * FROM '{base}/documents.parquet' WHERE false
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""",
        "documents",
    )
    rc |= _run(sf, NULL_QUERIES + ZERO_DOC_EXTRA)
    sf = _stage(
        "zero_events",
        """
COPY (
  SELECT * FROM '{base}/events.parquet' WHERE false
) TO '{out}/events.parquet' (FORMAT PARQUET)
""",
        "events",
    )
    rc |= _run(sf, NEG_QUERIES + ZERO_EVT_EXTRA)
    sf = _stage(
        "zero_emb",
        """
COPY (
  SELECT * FROM '{base}/embeddings.parquet' WHERE false
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""",
        "embeddings",
    )
    rc |= _run(sf, ZERO_EMB_QUERIES)
    sf = _stage(
        "zero_li",
        """
COPY (
  SELECT * FROM '{base}/lineitem.parquet' WHERE false
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""",
        "lineitem",
    )
    rc |= _run(sf, ZERO_LI_QUERIES)
    rc |= _assert_raises(sf, tuple(ZERO_LI_RAISING), "empty relation")
    sf = _stage(
        "zero_orders",
        """
COPY (
  SELECT * FROM '{base}/orders.parquet' WHERE false
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""",
        "orders",
    )
    rc |= _run(sf, ZERO_ORD_QUERIES)
    sf = _stage(
        "zero_customer",
        """
COPY (
  SELECT * FROM '{base}/customer.parquet' WHERE false
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""",
        "customer",
    )
    rc |= _run(sf, ZERO_CUST_QUERIES)
    sf = _stage(
        "zero_dims",
        """
COPY (
  SELECT * FROM '{base}/part.parquet' WHERE false
) TO '{out}/part.parquet' (FORMAT PARQUET);
COPY (
  SELECT * FROM '{base}/supplier.parquet' WHERE false
) TO '{out}/supplier.parquet' (FORMAT PARQUET)
""",
        ("part", "supplier"),
    )
    rc |= _run(sf, ZERO_DIM_QUERIES)
    return rc


def _assert_raises(sf: str, names: tuple, what: str) -> int:
    """Engine-side contract check (no oracle): the named queries must
    RAISE on this doctored slice (e.g. media builders on a NULL
    payload; global fits on an empty relation)."""
    import importlib.util

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    entrymod = importlib.util.module_from_spec(spec)
    sys.modules["entrymod"] = entrymod
    from blueforty___etl_data_pipeline_spark.session import get_spark

    spec.loader.exec_module(entrymod)
    spark = get_spark(app_name="fragility-raise-checks")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in names:
        try:
            entrymod.queries()[name](spark, sf).write.mode(
                "overwrite"
            ).format("noop").save()
            failures.append(name)
            print(f"FAIL {name}: completed on {what} (must raise)")
        except Exception as exc:  # noqa: BLE001 — raising IS the pass
            print(f"PASS {name}: raised {type(exc).__name__} on {what}")
    return 1 if failures else 0


def _assert_media_raises(sf: str) -> int:
    return _assert_raises(
        sf, ("media_sniff", "multimodal_decode_real"), "NULL payload"
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    rc = 0
    if mode in ("ws", "all"):
        print("=== whitespace audit (doctored documents.text) ===")
        rc |= audit_ws()
    if mode in ("neg", "all"):
        print("=== negative-values audit (doctored events.value) ===")
        rc |= audit_neg()
    if mode in ("edge", "all"):
        print("=== edge audit (empty/blank/single-token documents) ===")
        rc |= audit_edge()
    if mode in ("uni", "all"):
        print("=== unicode audit (non-ASCII documents) ===")
        rc |= audit_uni()
    if mode in ("null", "all"):
        print("=== null-text audit (round-14 NULL contract) ===")
        rc |= audit_null()
    if mode in ("zero", "all"):
        print("=== zero-row audit (empty documents / events slices) ===")
        rc |= audit_zero()
    sys.exit(rc)


if __name__ == "__main__":
    main()
