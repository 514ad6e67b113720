"""Scalar cleaning contract (SURVEY.md §2.8, F1-F12) — the Snowflake
null-on-failure semantics the loaders depend on."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.functions.cleaning import (
    int_flag_to_bool,
    nullif_empty,
    try_to_date,
    try_to_decimal,
    try_to_number,
    zip5,
    zip5_not_null_filter,
)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_try_to_number_valid(spark):
    assert _one(spark, try_to_number(F.lit("42"))) == 42


def test_try_to_number_garbage_is_null(spark):
    assert _one(spark, try_to_number(F.lit("abc"))) is None


def test_try_to_number_trims_whitespace(spark):
    assert _one(spark, try_to_number(F.lit("  7 "))) == 7


def test_try_to_decimal(spark):
    v = _one(spark, try_to_decimal(F.lit("12.3456"), 18, 4))
    assert str(v) == "12.3456"


def test_try_to_decimal_garbage_is_null(spark):
    assert _one(spark, try_to_decimal(F.lit("12x"), 18, 4)) is None


def test_try_to_date_with_format(spark):
    v = _one(spark, try_to_date(F.lit("01/31/2013"), "MM/dd/yyyy"))
    assert v == datetime.date(2013, 1, 31)


def test_try_to_date_bad_input_is_null(spark):
    assert _one(spark, try_to_date(F.lit("31/31/2013"), "MM/dd/yyyy")) is None


def test_try_to_date_formatless_iso(spark):
    v = _one(spark, try_to_date(F.lit("2013-01-31")))
    assert v == datetime.date(2013, 1, 31)


def test_nullif_empty(spark):
    assert _one(spark, nullif_empty(F.lit(""))) is None
    assert _one(spark, nullif_empty(F.lit("x"))) == "x"


def test_int_flag_to_bool(spark):
    assert _one(spark, int_flag_to_bool(F.lit("1"))) is True
    assert _one(spark, int_flag_to_bool(F.lit("0"))) is False
    assert _one(spark, int_flag_to_bool(F.lit("zz"))) is None


def test_zip5_pad_then_strip_order(spark):
    # The reference pads BEFORE stripping non-digits (BlueForty.py:364-388):
    # 'abc12' → lpad keeps it 5 chars → strip → '12' (NOT '00012').
    v = _one(spark, zip5(F.lit("abc12"), F.lit(None).cast("string")))
    assert v == "12"


def test_zip5_pads_short_numeric(spark):
    assert _one(spark, zip5(F.lit("42"), F.lit(None).cast("string"))) == "00042"


def test_zip5_uses_fallback(spark):
    v = _one(spark, zip5(F.lit(None).cast("string"), F.lit("30301")))
    assert v == "30301"


def test_zip5_filter_rejects_empty_and_null(spark):
    df = spark.createDataFrame(
        [("90210", None), (None, "1"), ("", None), (None, None)],
        "p string, f string",
    )
    kept = df.filter(zip5_not_null_filter(F.col("p"), F.col("f"))).collect()
    assert [(r["p"], r["f"]) for r in kept] == [("90210", None), (None, "1")]


def test_normalize_unicode_forms_and_vectorized_plan(spark):
    """NFC composes decomposed sequences; NFKC additionally folds
    compatibility forms (ligatures, fullwidth); nulls pass through;
    the plan is Arrow-vectorized (ArrowEvalPython), never a
    row-at-a-time BatchEvalPython."""
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        normalize_unicode,
    )

    rows = [
        (1, "café"),          # decomposed acute
        (2, "ﬁle"),            # LATIN SMALL LIGATURE FI + "le"
        (3, "Ａ１"),        # fullwidth A1
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])

    nfc = {
        r["id"]: r
        for r in normalize_unicode(df, "text", form="NFC").collect()
    }
    assert nfc[1]["text_norm"] == "café"
    assert nfc[1]["was_normalized"] is True
    assert nfc[2]["text_norm"] == "ﬁle"  # NFC keeps ligature
    assert nfc[2]["was_normalized"] is False
    assert nfc[4]["text_norm"] is None
    assert nfc[4]["was_normalized"] is False
    assert nfc[5]["was_normalized"] is False

    nfkc = {
        r["id"]: r
        for r in normalize_unicode(df, "text", form="NFKC").collect()
    }
    assert nfkc[2]["text_norm"] == "file"     # ligature folded
    assert nfkc[3]["text_norm"] == "A1"       # fullwidth folded

    import pytest as _pt

    with _pt.raises(ValueError):
        normalize_unicode(df, "text", form="NFX")

    plan = (
        normalize_unicode(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_strip_markdown_constructs(spark):
    """Each markdown construct strips correctly and order is
    load-bearing (image before link, fences before inline code)."""
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.functions.text import (
        strip_markdown,
    )

    cases = [
        ("# Head\nbody", "Head body"),  # marker dropped, text kept
        ("### Deep head\ntail", "Deep head tail"),
        ("> quote line\nrest", "quote line rest"),
        ("- a\n* b\n+ c", "a b c"),
        ("1. first\n12. twelfth", "first twelfth"),
        ("**bold** and *ital*", "bold and ital"),
        ("__bold__ and _ital_", "bold and ital"),
        ("[text](http://u) end", "text end"),
        ("![alt](http://img) end", "alt end"),
        ("pre ```fenced\ncode``` post", "pre post"),
        ("pre `inline` post", "pre post"),
        # image vs link ordering: the bang must not survive
        ("x ![a](u) [b](v) y", "x a b y"),
        # fence containing backticks-adjacent text
        ("```\n`not inline`\n``` kept", "kept"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], ["i", "md"]
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", strip_markdown(F.col("md")).alias("out")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_luhn_valid_and_mask(spark):
    """Known test vectors: the canonical valid PANs pass, a one-digit
    perturbation fails, shape violations (short, non-digit, null) are
    false not null, and masking touches only checksum-valid strings."""
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.functions.cleaning import (
        luhn_valid,
        mask_pan,
    )

    rows = [
        ("4532015112830366", True),   # canonical Visa test number
        ("4532015112830367", False),  # last digit perturbed
        ("5425233430109903", True),   # canonical Mastercard test
        ("1234567812345670", True),   # constructed valid
        ("1234567812345678", False),
        ("123456781234567a", False),  # non-digit
        ("12345678", False),          # short
        (None, False),
    ]
    df = spark.createDataFrame(
        [(p,) for p, _ in rows], ["pan"]
    )
    got = df.select(
        "pan",
        luhn_valid(F.col("pan")).alias("ok"),
        mask_pan(F.col("pan")).alias("m"),
    ).collect()
    for (pan, want), r in zip(rows, got):
        assert r["ok"] is want, (pan, r["ok"])
        if want:
            assert r["m"] == "*" * 12 + pan[-4:]
        else:
            assert r["m"] == pan
    # pure codegen: no Python in the plan
    plan = (
        df.select(mask_pan(F.col("pan")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_registrable_domain_psl_shapes(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.functions.text import (
        registrable_domain,
    )

    cases = {
        "www.example.com": "example.com",
        "a.b.co.uk": "b.co.uk",
        "deep.sub.x.github.io": "x.github.io",   # private registry
        "me.blogspot.com": "me.blogspot.com",
        "api.S3.AMAZONAWS.com": "api.s3.amazonaws.com",  # 3-label suffix
        "co.uk": None,        # host IS a public suffix -> no domain
        "blogspot.com": None,
        "uk": None,
        "localhost": None,
        "foo.unknowntld": None,
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r["h"]: r["registrable_domain"]
        for r in df.select(
            "h", registrable_domain(F.col("h"))
        ).collect()
    }
    assert got == cases


def test_canonicalize_url_shapes(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import (
        canonicalize_url,
    )

    cases = {
        # case, www, default port, tracking params, param sort, fragment
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#f":
            "https://example.com/a/b?a=1&b=2",
        # non-default port and userinfo: port kept, userinfo dropped
        "http://user:pw@www.site.co.uk:8080/p?fbclid=z&z=9&A=2":
            "http://site.co.uk:8080/p?A=2&z=9",
        # default http port dropped
        "http://example.com:80/x": "http://example.com/x",
        # empty path -> '/'; all-tracking query drops its '?'
        "https://example.com?utm_a=1&gclid=2": "https://example.com/",
        # root path keeps its slash
        "https://example.com/": "https://example.com/",
        # non-http(s) and garbage -> NULL (quarantine, not a dedup key)
        "ftp://example.com/x": None,
        "not a url": None,
        # '?' INSIDE the fragment (SPA routing) is not a query string:
        # pages differing only in fragment must collapse to one key
        "https://h.example/p#/route?x=1": "https://h.example/p",
        # real query followed by a fragment that also contains '?'
        "https://h.example/p?a=1#frag?x=2": "https://h.example/p?a=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select(
            "u", canonicalize_url(F.col("u")).alias("c")
        ).collect()
    }
    assert got == cases


def test_anonymize_ipv4_prefix_properties(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import (
        anonymize_ipv4_prefix,
    )

    ips = [
        "10.0.0.1", "10.0.0.2", "10.0.1.1", "10.1.0.1",
        "192.168.5.77", "192.168.5.78", "255.255.255.255", "0.0.0.0",
        "not.an.ip.x", "1.2.3",
    ]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    got = {
        r["ip"]: r["anon"]
        for r in df.select(
            "ip", anonymize_ipv4_prefix(F.col("ip"), "k1").alias("anon")
        ).collect()
    }
    # malformed -> NULL
    assert got["not.an.ip.x"] is None and got["1.2.3"] is None
    valid = {k: v for k, v in got.items() if v is not None}
    # bijective: distinct in -> distinct out
    assert len(set(valid.values())) == len(valid)
    # prefix-preserving: shared /24 stays shared, split /16 stays split
    a = {k: v.split(".") for k, v in valid.items()}
    assert a["10.0.0.1"][:3] == a["10.0.0.2"][:3]
    assert a["10.0.0.1"][:2] == a["10.0.1.1"][:2]
    assert a["10.0.0.1"][:1] == a["10.1.0.1"][:1]
    assert a["10.0.0.1"][2] != a["10.0.1.1"][2]
    assert a["10.0.0.1"][1] != a["10.1.0.1"][1]
    assert a["192.168.5.77"][:3] == a["192.168.5.78"][:3]
    # keyed: a different key produces a different mapping somewhere
    got2 = {
        r["ip"]: r["anon"]
        for r in df.select(
            "ip", anonymize_ipv4_prefix(F.col("ip"), "k2").alias("anon")
        ).collect()
        if r["anon"] is not None
    }
    assert any(valid[k] != got2[k] for k in valid)


def test_strip_latex_chain(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import (
        strip_latex,
    )

    cases = {
        # comments, env markers, nested commands, inline + display math
        "\\documentclass{article} % note\n\\begin{document}"
        "\\section{Intro} hello \\textbf{bold \\emph{nested}} world "
        "$x^2$ and $$\\int f$$ \\alpha tail\\end{document}":
            "article Intro hello bold nested world and tail",
        # escaped percent survives; optional args drop with the command
        "keep 100\\% \\cite[p.~3]{ref} done": "keep 100\\% ref done",
        "plain stays plain": "plain stays plain",
    }
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = [r["s"] for r in df.select(strip_latex(F.col("t")).alias("s")).collect()]
    assert got == list(cases.values())


def test_ulid_time_ordering_and_spec_shape(spark):
    """ULIDs (functions/ids.py): 26 Crockford chars, lexicographic
    order follows timestamp order, and a known timestamp encodes to
    the spec's time prefix."""
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.functions.ids import (
        ulid_from_parts,
    )

    rows = [(i, 1_700_000_000_000 + i * 60_000) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, ts_ms long")
    out = df.select(
        "ts_ms", ulid_from_parts(F.col("ts_ms"), F.col("k")).alias("u")
    ).collect()
    assert all(len(r["u"]) == 26 for r in out)
    assert all(
        set(r["u"]) <= set("0123456789ABCDEFGHJKMNPQRSTVWXYZ")
        for r in out
    )
    by_ts = [r["u"] for r in sorted(out, key=lambda r: r["ts_ms"])]
    assert by_ts == sorted(by_ts)  # time-ordered ids sort lexically
    # spec vector: ms 1469918176385 encodes to time prefix 01ARYZ6S41
    one = df.sparkSession.createDataFrame(
        [(7, 1469918176385)], "k long, ts_ms long"
    ).select(ulid_from_parts(F.col("ts_ms"), F.col("k")).alias("u"))
    assert one.collect()[0]["u"][:10] == "01ARYZ6S41"
