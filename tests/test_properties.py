"""Property-based tests (hypothesis) over the pure-Python cores — the
sharding hash-range algebra and the record codec. The Go reference has
no property framework (SURVEY.md §5); these strengthen the invariants
its unit tests only spot-check."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from apm_opentelemetry_collector_spark.config import RECORD_MAGIC
from apm_opentelemetry_collector_spark.functions import sharding
from apm_opentelemetry_collector_spark.operators.encode import decode_record

keys = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    min_size=0,
    max_size=64,
)


@given(keys, st.integers(min_value=1, max_value=512))
@settings(max_examples=200, deadline=None)
def test_every_key_owned_by_exactly_one_even_shard(key, n):
    sh = sharding.even_shards(n)
    owners = [
        s["shard_id"]
        for s in sh
        if s["start_key"] <= sharding.hash_key_py(key) <= s["end_key"]
    ]
    assert len(owners) == 1
    assert owners[0] == sharding.shard_of(key, sh)


@given(st.integers(min_value=1, max_value=512))
@settings(max_examples=100, deadline=None)
def test_even_shards_cover_space_without_overlap(n):
    sh = sharding.even_shards(n)
    assert sharding.validate_sharding_config(sh) == sh  # sorted, valid
    ints = [(int(s["start_key"], 16), int(s["end_key"], 16)) for s in sh]
    assert ints[0][0] == 0 and ints[-1][1] == sharding.HASH_SPACE_MAX
    for (s1, e1), (s2, e2) in zip(ints, ints[1:]):
        assert e1 + 1 == s2 and s1 <= e1 and s2 <= e2


@given(keys)
@settings(max_examples=200, deadline=None)
def test_hex_string_compare_equals_bigint_compare(key):
    # the engine's core invariant: lexicographic compare of the 32-char
    # hex md5 == unsigned 128-bit numeric compare
    hk = sharding.hash_key_py(key)
    assert len(hk) == 32
    assert int(hk, 16) == sharding.hash_key_int(key)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef0123456789-", min_size=1, max_size=16),
            st.integers(min_value=0, max_value=10**6),
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\t\n\x00"),
                max_size=100,
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_record_codec_round_trip(rows):
    # mirror _encode_group's framing without Spark
    payload = "\n".join(f"{c}\t{i}\t{t}" for c, i, t in rows).encode("utf-8")
    data = RECORD_MAGIC + gzip.compress(payload)
    decoded = decode_record(data)
    assert decoded == [(c, i, t) for c, i, t in rows]


@given(
    st.lists(
        st.tuples(st.floats(min_value=-1e6, max_value=1e6), st.integers(1, 1000)),
        min_size=1,
        max_size=400,
    ),
    st.floats(min_value=0.01, max_value=0.99),
)
@settings(max_examples=60, deadline=None)
def test_tdigest_merge_invariants(points, q):
    """Pure-Python core of the t-digest: weight conservation, sorted
    means, bounded size, and quantile inside the data range — for any
    weighted input."""
    import numpy as np

    from apm_opentelemetry_collector_spark.operators.tdigest import (
        _merge,
        _quantile,
    )

    pts = sorted(points)
    means = np.array([p[0] for p in pts], dtype=float)
    weights = np.array([p[1] for p in pts], dtype=float)
    m, w = _merge(means, weights, 100)
    assert abs(float(w.sum()) - float(weights.sum())) < 1e-6 * max(1.0, weights.sum())
    assert np.all(np.diff(m) >= -1e-12)
    assert len(m) <= 300
    est = _quantile(m, w, q)
    assert means.min() - 1e-9 <= est <= means.max() + 1e-9


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6), min_size=2, max_size=600
    ),
    st.integers(min_value=2, max_value=8),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=40, deadline=None)
def test_tdigest_two_level_merge_within_rank_tolerance(vals, n_parts, q):
    """SQL-aggregate composition property: splitting the values into
    any number of partial digests and merging (the tdigest_merge_agg
    path) must estimate q within ±0.05 RANK of the true quantile —
    merging partials loses a little resolution vs a single-pass digest,
    but the rank guarantee holds."""
    import numpy as np

    from apm_opentelemetry_collector_spark.operators.tdigest import (
        _encode_digest,
        _merge,
        _merge_encoded,
        _quantile,
    )

    arr = np.asarray(vals, dtype=float)
    parts = []
    for i in range(n_parts):
        chunk = np.sort(arr[i::n_parts])
        if len(chunk):
            m, w = _merge(chunk, np.ones(len(chunk)), 100)
            parts.append(_encode_digest(m, w))
    m, w = _merge_encoded(parts, 100)
    assert abs(float(w.sum()) - len(arr)) < 1e-6 * max(1.0, len(arr))
    est = _quantile(m, w, q)
    srt = np.sort(arr)
    # rank-based bracket (floor/ceil order statistics, not value
    # interpolation — the latter over-tightens for tiny n, where e.g.
    # the exact rank-0 answer at n=2, q=0.25 sits below the linearly
    # interpolated 0.2)
    lo = np.quantile(srt, max(q - 0.05, 0.0), method="lower")
    hi = np.quantile(srt, min(q + 0.05, 1.0), method="higher")
    assert lo - 1e-9 <= est <= hi + 1e-9


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=80, deadline=None)
def test_u48_sql_matches_python(doc_id):
    """The nibble-arithmetic SQL twin of the 48-bit md5 uniform must
    produce exactly the Python/Spark value for any id."""
    import hashlib

    import duckdb

    from apm_opentelemetry_collector_spark.operators.sample import u48_sql

    hx = hashlib.md5(str(doc_id).encode()).hexdigest()[:12]
    want = (int(hx, 16) + 0.5) / float(1 << 48)
    got = duckdb.sql(
        f"SELECT {u48_sql('doc_id')} AS u FROM (SELECT {doc_id} AS doc_id)"
    ).fetchone()[0]
    assert got == want


# --- repeated_spans vs an INDEPENDENT pure-Python reference -----------------
# The DuckDB oracle shares the operator's structural decomposition
# (windows → hot → islands); this reference implements the SAME
# semantics from the definition alone, so a shared structural mistake
# would be caught here.


def _spans_reference(texts, seed_len, min_len, min_docs):
    import re
    from collections import Counter, defaultdict

    norm = {
        i: re.sub(r"\s+", " ", t.lower()).strip() for i, t in enumerate(texts)
    }
    seed_docs = defaultdict(set)
    for i, s in norm.items():
        for p in range(len(s) - seed_len + 1):
            seed_docs[s[p : p + seed_len]].add(i)
    hot = {g for g, ds in seed_docs.items() if len(ds) >= min_docs}
    span_occ = Counter()
    span_docs = defaultdict(set)
    for i, s in norm.items():
        positions = [
            p for p in range(len(s) - seed_len + 1) if s[p : p + seed_len] in hot
        ]
        runs = []
        for p in positions:
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        for p0, p1 in runs:
            span = s[p0 : p1 + seed_len]
            if len(span) >= min_len:
                span_occ[span] += 1
                span_docs[span].add(i)
    return {
        sp: (len(span_docs[sp]), n)
        for sp, n in span_occ.items()
        if len(span_docs[sp]) >= min_docs
    }


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=60),
        min_size=2,
        max_size=10,
    ),
    st.integers(min_value=3, max_value=6),
)
def test_repeated_spans_matches_python_reference(spark, texts, seed_len):
    """Random tiny-alphabet corpora (forced repeats, whitespace runs,
    empty docs): the Spark operator's (span → n_docs, n_total) map must
    equal the from-the-definition Python reference exactly."""
    from apm_opentelemetry_collector_spark.operators.dedup import repeated_spans

    min_len, min_docs = seed_len + 2, 2
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["span"]: (r["n_docs"], r["n_total"])
        for r in repeated_spans(
            docs, seed_len=seed_len, min_len=min_len, min_docs=min_docs
        ).collect()
    }
    want = _spans_reference(texts, seed_len, min_len, min_docs)
    assert got == want


# --- exactsubstr_dedup vs an INDEPENDENT pure-Python reference ---------------
# Same rationale as the repeated_spans reference above: the DuckDB twin
# shares the operator's windows → hot → islands → complement structure;
# this implements the removal semantics from the definition alone.


def _exactsubstr_reference(texts, seed_len, min_len, min_copies):
    import re
    from collections import Counter

    norm = {
        i: re.sub(r"\s+", " ", t.lower()).strip() for i, t in enumerate(texts)
    }
    seed_count = Counter()
    for s in norm.values():
        for p in range(len(s) - seed_len + 1):
            seed_count[s[p : p + seed_len]] += 1
    hot = {g for g, c in seed_count.items() if c >= min_copies}
    out = {}
    for i, s in norm.items():
        positions = [
            p for p in range(len(s) - seed_len + 1) if s[p : p + seed_len] in hot
        ]
        runs = []
        for p in positions:
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        iv = [
            (p0, p1 + seed_len - 1)
            for p0, p1 in runs
            if (p1 + seed_len - 1) - p0 + 1 >= min_len
        ]
        cleaned, cur = [], 0
        for lo, hi in iv:
            cleaned.append(s[cur:lo])
            cur = hi + 1
        cleaned.append(s[cur:])
        out[i] = (
            len(s),
            sum(hi - lo + 1 for lo, hi in iv),
            len(iv),
            bool(iv),
            "".join(cleaned),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=60),
        min_size=2,
        max_size=10,
    ),
    st.integers(min_value=3, max_value=6),
)
def test_exactsubstr_dedup_matches_python_reference(spark, texts, seed_len):
    """Random tiny-alphabet corpora (forced repeats, within-doc repeats,
    whitespace runs, empty docs): the Spark rewrite's full row map
    (n_chars, n_removed_chars, n_spans_removed, changed, cleaned_text)
    must equal the from-the-definition Python reference exactly."""
    from apm_opentelemetry_collector_spark.operators.dedup import (
        exactsubstr_dedup,
    )

    min_len, min_copies = seed_len + 2, 2
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["n_removed_chars"],
            r["n_spans_removed"],
            r["changed"],
            r["cleaned_text"],
        )
        for r in exactsubstr_dedup(
            docs, seed_len=seed_len, min_len=min_len, min_copies=min_copies
        ).collect()
    }
    want = _exactsubstr_reference(texts, seed_len, min_len, min_copies)
    assert got == want


# --- c4_span_dedup vs an INDEPENDENT pure-Python reference -------------------


def _c4_span_reference(texts, n=3):
    from collections import defaultdict

    lines = {i: t.split("\n") for i, t in enumerate(texts)}
    removed: dict[int, set] = defaultdict(set)
    seen = set()
    for i in sorted(lines):
        ls = lines[i]
        for j in range(len(ls) - n + 1):
            key = "\n".join(ls[j : j + n])
            if key in seen:
                removed[i].update(range(j, j + n))
            else:
                seen.add(key)
    out = {}
    for i, ls in lines.items():
        rm = removed.get(i, set())
        kept = [l for k, l in enumerate(ls) if k not in rm]
        out[i] = (
            len(ls),
            len(rm),
            bool(rm),
            "\n".join(kept) if rm else texts[i],
        )
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "ab", "x", ""]), min_size=0, max_size=8
        ).map("\n".join),
        min_size=2,
        max_size=8,
    )
)
def test_c4_span_dedup_matches_python_reference(spark, texts):
    """Random tiny-line corpora (forced duplicate 3-line windows, empty
    lines, short docs): c4_span_dedup's (n_lines, n_removed_lines,
    changed, cleaned_text) per doc must equal the from-the-definition
    global-first-occurrence reference exactly."""
    from apm_opentelemetry_collector_spark.operators.dedup import c4_span_dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["n_removed_lines"],
            r["changed"],
            r["cleaned_text"],
        )
        for r in c4_span_dedup(docs).collect()
    }
    want = _c4_span_reference(texts)
    assert got == want
