"""Property-based tests (hypothesis): Spark operators vs pure-Python
reference implementations on randomized inputs — the randomized analog
of the DuckDB oracle gate (fixtures can only encode the cases we
thought of; these hunt for the ones we didn't).

Each example batches many rows into ONE DataFrame so the per-example
Spark roundtrip cost is paid once; max_examples is kept small because
every example is a full distributed job."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

from otel2pv_spark.functions import prep

SET = settings(max_examples=5, deadline=None)

WORD = st.text(alphabet="abcdefgh ", min_size=0, max_size=20)
PII = st.sampled_from(
    [
        "x@y.io",
        "a.b+c@test-site.org",
        "https://ex.com/p?id=1234567890",
        "http://a.b/c",
        "10.0.0.1",
        "255.255.255.255",
        "123456789",
        "98765432101234",
        "12345678",      # below the 9-digit threshold: kept
        "1.2.3",         # not an IPv4: kept
        "EMAIL>@d.ee",   # adversarial: looks like a replacement token
    ]
)
TEXT = st.lists(WORD | PII, min_size=0, max_size=12).map(" ".join)


def _py_scrub(text: str):
    """Reference scrub: same staged pipeline via Python re (Java regex
    and Python re agree on this lookaround-free portable subset)."""
    counts = {}
    for name, pat, token in prep.SCRUB_STAGES:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        text = re.sub(pat, token, text)
    return text, counts


@SET
@given(st.lists(TEXT, min_size=1, max_size=25))
def test_scrub_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in prep.scrub_text(df).collect()}
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        want_text, want_counts = _py_scrub(t)
        assert got[i]["scrubbed"] == want_text, repr(t)
        for k, v in want_counts.items():
            assert got[i][k] == v, (repr(t), k)
        assert got[i]["n_redactions"] == sum(want_counts.values())


def _py_frac(doc_id: int, salt: str) -> float:
    h = hashlib.md5(f"{doc_id}#{salt}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


@SET
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40, unique=True))
def test_split_matches_python_reference(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {r["doc_id"]: r for r in prep.assign_split(df).collect()}
    for i in ids:
        f = _py_frac(i, "split-v1")
        want = "train" if f < 0.9 else ("val" if f < 0.95 else "test")
        assert got[i]["split"] == want
        assert abs(got[i]["hash_frac"] - round(f, 6)) < 1e-9


def _py_components(edges, nodes):
    """Reference union-find with path compression."""
    parent = {n: n for n in nodes}
    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label = min member id per component
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in groups.values() for n in ms}


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Large-star/small-star vs union-find on random graphs (self-loops
    and duplicate edges included; chains, cycles, isolated nodes)."""
    from otel2pv_spark.functions import dedup as dd

    nodes = list(range(31))
    ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
    edf = spark.createDataFrame(
        edges or [(0, 0)], ["doc_a", "doc_b"]
    )  # empty DataFrames need a schema; (0,0) is a self-loop no-op
    got = {
        r["doc_id"]: r["component"]
        for r in dd.connected_components(edf, nodes=ndf).collect()
    }
    want = _py_components([e for e in edges if e[0] != e[1]], nodes)
    assert got == want


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=64),
)
def test_pack_matches_python_reference(spark, tok_counts, budget):
    rows = [(i, "w " * n) for i, n in enumerate(tok_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["shard"], r["doc_id"], r["pack_id"], r["pack_offset"], r["n_tokens"])
        for r in prep.pack_sequences(df, budget=budget, n_shards=4).collect()
    )
    # reference: shard by the same md5, lay out head-to-tail per shard
    by_shard: dict[int, list[int]] = {}
    for i, n in enumerate(tok_counts):
        h = hashlib.md5(f"{i}#pack-v1".encode()).hexdigest()
        by_shard.setdefault(int(h[:8], 16) % 4, []).append(i)
    want = []
    for shard, members in by_shard.items():
        cum = 0
        for i in sorted(members):
            want.append((shard, i, cum // budget, cum % budget, tok_counts[i]))
            cum += tok_counts[i]
    assert got == sorted(want)
