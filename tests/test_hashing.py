"""Canonical hash invariants — mirrors reference tests/test_all.py:619-704.

The keystone contract: Python pset_hash == Spark hash_expr == DuckDB
hash_sql, key-order invariant, type-sensitive, kind-filtering.
"""

import datetime as dt

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from psweep_spark.hashing import (
    canon_value,
    col_kind,
    filter_cols,
    hash_expr,
    hash_sql,
    pset_hash,
)


def test_key_order_invariance():
    # reference tests/test_all.py:619-626
    assert pset_hash({"a": 1, "b": 2}) == pset_hash({"b": 2, "a": 1})


def test_type_sensitivity():
    assert pset_hash({"a": 1}) != pset_hash({"a": 1.0})
    assert pset_hash({"a": 1}) != pset_hash({"a": "1"})
    assert pset_hash({"a": True}) != pset_hash({"a": 1})


def test_prefix_postfix_skipped():
    # reference tests/test_all.py:658-676
    base = pset_hash({"a": 1})
    assert pset_hash({"a": 1, "_run_id": "x", "result_": 99}) == base
    # all-special edge case == empty pset hash (tests/test_all.py:1527-1535)
    assert pset_hash({"_x": 1, "y_": 2}) == pset_hash({})


def test_numpy_type_mapping():
    # typed core: np.int64 == python int (documented deviation from joblib)
    assert pset_hash({"a": np.int64(7)}) == pset_hash({"a": 7})
    assert pset_hash({"a": np.float64(7.5)}) == pset_hash({"a": 7.5})
    assert pset_hash({"a": np.array([1.0, 2.0])}) == pset_hash({"a": [1.0, 2.0]})


def test_none_and_nan():
    assert canon_value(None) == "n"
    assert canon_value(float("nan")) == "n"
    assert pset_hash({"a": None}) != pset_hash({})  # null col still keyed


def test_canon_value_formats():
    assert canon_value(5) == "i:5"
    assert canon_value(True) == "b:true"
    assert canon_value("héllo") == f"s{len('héllo'.encode())}:héllo"
    assert canon_value(1.5) == "d:1.500000000000000000"
    assert canon_value(0.1) == "d:0.100000000000000000"
    assert canon_value(-0.0) == "d:0.000000000000000000"
    assert canon_value(1e17) == "d:100000000000000000.000000000000000000"
    assert canon_value([1, None, 2]) == "[i:1,n,i:2]"
    assert canon_value({"b": 1, "a": 2}) == "{a=i:2,b=i:1}"
    with pytest.raises(ValueError):
        canon_value(1e19)


ZOO_PSETS = [
    {"a": 1, "b": "x", "c": 1.5, "d": True, "e": None},
    {"a": -7, "b": "", "c": 0.1, "d": False, "e": "z"},
    {"a": 0, "b": "héllo wörld", "c": -2.25, "d": True, "e": None},
    {"a": 2**40, "b": "s;=,k1:", "c": 1.23456789e-10, "d": False, "e": "q"},
    {"a": 5, "b": "x", "c": float(np.float32(0.1)), "d": True, "e": None},
]


def test_python_vs_spark_hash_parity(spark):
    """The same psets must hash identically via the Python mirror and the
    Catalyst expression — the engine's core determinism contract."""
    from psweep_spark.runner import prepare_params_df

    df = prepare_params_df(spark, ZOO_PSETS)
    got = (
        df.withColumn("h", hash_expr(df.schema))
        .select("a", "h")
        .orderBy("a")
        .collect()
    )
    expected = {p["a"]: pset_hash(p) for p in ZOO_PSETS}
    for r in got:
        assert r["h"] == expected[r["a"]], f"mismatch for a={r['a']}"


def test_python_vs_duckdb_hash_parity():
    """hash_sql (the oracle emitter) agrees with pset_hash for scalar
    int/string/bool psets."""
    psets = [
        {"a": 1, "b": "x", "d": True},
        {"a": -5, "b": "héllo", "d": False},
        {"a": None, "b": None, "d": None},
    ]
    expr = hash_sql({"a": "bigint", "b": "varchar", "d": "boolean"})
    con = duckdb.connect()
    for p in psets:
        a = "NULL" if p["a"] is None else str(p["a"])
        b = "NULL" if p["b"] is None else f"'{p['b']}'"
        d = "NULL" if p["d"] is None else str(p["d"]).lower()
        got = con.sql(
            f"SELECT {expr} AS h FROM (SELECT {a}::BIGINT AS a, {b}::VARCHAR AS b, {d}::BOOLEAN AS d)"
        ).fetchone()[0]
        assert got == pset_hash(p), f"duckdb mismatch for {p}"


def test_spark_hash_array_struct(spark):
    psets = [{"a": [1, 2, 3], "b": "q"}, {"a": [], "b": None}]
    from psweep_spark.runner import prepare_params_df

    df = prepare_params_df(spark, psets)
    got = df.withColumn("h", hash_expr(df.schema)).select("b", "h").collect()
    exp = {p["b"]: pset_hash(p) for p in psets}
    for r in got:
        assert r["h"] == exp[r["b"]]


def test_timestamp_hash_parity(spark):
    ts = dt.datetime(2024, 5, 1, 12, 30, 15, 123456)
    psets = [{"a": 1, "t": ts}]
    from psweep_spark.runner import prepare_params_df

    df = prepare_params_df(spark, psets)
    got = df.withColumn("h", hash_expr(df.schema)).first()["h"]
    assert got == pset_hash(psets[0])


def test_col_kind():
    assert col_kind("_run_id") == "prefix"
    assert col_kind("result_") == "postfix"
    assert col_kind("a") == "pset"
    assert filter_cols(["a", "_x", "y_", "b"]) == ["a", "b"]
    assert filter_cols(["a", "_x", "y_"], "prefix") == ["_x"]
    assert filter_cols(["a", "_x", "y_"], "postfix") == ["y_"]


# -- property-based invariants (SURVEY M1: the keystone contract) ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    # canonical-hash contract: |float| < 1e18 (hashing.py raises above)
    st.floats(
        allow_nan=False, allow_infinity=False, width=64,
        min_value=-9.99e17, max_value=9.99e17,
    ),
    st.text(max_size=12),
)
_pset = st.dictionaries(
    st.sampled_from(["a", "b", "c", "x1", "y2"]), _scalar, min_size=1, max_size=5
)


@given(_pset)
@settings(max_examples=200, deadline=None)
def test_prop_key_order_invariance(p):
    shuffled = dict(reversed(list(p.items())))
    assert pset_hash(p) == pset_hash(shuffled)


@given(_pset)
@settings(max_examples=200, deadline=None)
def test_prop_hash_is_stable_and_injective_on_repr(p):
    # same dict twice → same hash; canon round-trip is deterministic
    assert pset_hash(p) == pset_hash(dict(p))
    assert len(pset_hash(p)) == 64  # sha256 hex


@given(st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="'\\\x00"), max_size=8),
        st.booleans(),
    ),
    min_size=1,
    max_size=3,
))
@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_prop_python_vs_duckdb_parity(p):
    """Generated scalar psets hash identically through pset_hash and the
    SQL emitted by hash_sql — the oracle emitter cannot drift."""
    duck_t = {int: "BIGINT", str: "VARCHAR", bool: "BOOLEAN"}
    cols = {k: duck_t[type(v)].lower() for k, v in p.items()}
    expr = hash_sql(cols)
    sels = []
    for k, v in p.items():
        if isinstance(v, bool):
            sels.append(f"{str(v).lower()}::BOOLEAN AS {k}")
        elif isinstance(v, int):
            sels.append(f"{v}::BIGINT AS {k}")
        else:
            esc = v.replace("'", "''")
            sels.append(f"'{esc}'::VARCHAR AS {k}")
    got = duckdb.sql(
        f"SELECT {expr} AS h FROM (SELECT {', '.join(sels)})"
    ).fetchone()[0]
    assert got == pset_hash(p), p


# ---------------------------------------------------------------------------
# joblib-compat migration hash (compat_hash.py; reference psweep.py:33,208-270)
# ---------------------------------------------------------------------------


def test_joblib_compat_known_answer_streams():
    """The compat hasher's pickle streams are pinned OPCODE BY OPCODE
    against hand-derived protocol-3 sequences from the pickle spec
    (PROTO, EMPTY_DICT, BINPUT, BINUNICODE, BININT1/G, SETITEM(S),
    STOP) — an independent construction, since joblib itself is not
    installed here.  These are exactly the streams joblib's Hasher
    emits (pure-python pickler, protocol 3, strings unmemoized, dict
    items sorted), so the digests are the reference's hashes."""
    import hashlib

    from psweep_spark.compat_hash import Hasher, joblib_hash

    cases = {
        # {'a': 1}: PROTO3 EMPTY_DICT BINPUT0 BINUNICODE('a') BININT1(1)
        # SETITEM STOP
        b"\x80\x03}q\x00X\x01\x00\x00\x00aK\x01s.": {"a": 1},
        # two items -> MARK ... SETITEMS
        b"\x80\x03}q\x00(X\x01\x00\x00\x00aK\x01X\x01\x00\x00\x00bK\x02u.":
            {"a": 1, "b": 2},
        # float -> BINFLOAT big-endian IEEE754
        b"\x80\x03}q\x00X\x01\x00\x00\x00kG?\xb9\x99\x99\x99\x99\x99\x9as.":
            {"k": 0.1},
    }
    for stream, obj in cases.items():
        h = Hasher("sha1")
        h.dump(obj)
        assert h.stream.getvalue() == stream, obj
        assert joblib_hash(obj, "sha1") == hashlib.sha1(stream).hexdigest()


def test_joblib_compat_semantics():
    """joblib hashing semantics: key-order invariant, type-sensitive
    (the int-vs-np.int64 trap the reference documents in
    examples/repeat_failed.py:58-61), string-identity-insensitive,
    set-order-invariant, ndarray-buffer-aware."""
    from psweep_spark.compat_hash import joblib_hash

    assert joblib_hash({"a": 1, "b": 2}) == joblib_hash({"b": 2, "a": 1})
    assert joblib_hash({"a": 1}) != joblib_hash({"a": 1.0})
    assert joblib_hash({"a": 1}) != joblib_hash({"a": np.int64(1)})
    s2 = "aaZ"[:2]
    assert joblib_hash(["aa", "aa"]) == joblib_hash(["aa", s2])
    assert joblib_hash({1, 2, 3}) == joblib_hash({3, 1, 2})
    a = np.arange(4, dtype=np.int64)
    assert joblib_hash(a) == joblib_hash(a.copy())
    assert joblib_hash(a) != joblib_hash(a.astype(np.int32))


def test_pset_hash_joblib_method_filters_special_cols():
    from psweep_spark.compat_hash import joblib_hash

    h = pset_hash({"a": 1, "_run_id": "x", "y_": 9}, method="joblib-sha1")
    assert h == joblib_hash({"a": 1}, "sha1")
    assert h != pset_hash({"a": 1})  # different algorithm families
    with pytest.raises(ValueError):
        pset_hash({"a": 1}, method="bogus")


def test_compat_hash_mixed_type_keys():
    """Unorderable (mixed-type) dict keys take joblib's substituted
    (hash(k), v) path (joblib hashing.py _batch_setitems; restored per
    ADVICE r5): the emitted stream must equal the stream of the same
    dict re-keyed by hash(k).  Keys here are ints / int-tuples so
    hash() is deterministic across processes — with string keys even
    real joblib's digest is PYTHONHASHSEED-dependent, which is why
    string-keyed psets (the actual migration surface) sort in the
    orderable branch and never reach this code."""
    from psweep_spark.compat_hash import Hasher, joblib_hash

    mixed = {1: "a", (2, 3): "b"}
    subst = {hash(k): v for k, v in mixed.items()}
    h1 = Hasher("sha1")
    h1.dump(mixed)
    h2 = Hasher("sha1")
    h2.dump(subst)
    assert h1.stream.getvalue() == h2.stream.getvalue()
    assert joblib_hash(mixed) == joblib_hash(subst)
    # insertion-order invariant under the hash-substituted sort
    assert joblib_hash({(2, 3): "b", 1: "a"}) == joblib_hash(mixed)
