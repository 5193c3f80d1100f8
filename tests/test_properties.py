"""Property-based tests (hypothesis): algebraic laws the composed
operators must satisfy on arbitrary small inputs, complementing the
fixed-dataset oracle parity.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

from s3_rds_bq_airflow_spark.operators.cluster import connected_components
from s3_rds_bq_airflow_spark.operators.merge import dedup_latest, merge_upsert
from s3_rds_bq_airflow_spark.operators.skew import salted_groupby
from s3_rds_bq_airflow_spark.operators.temporal import asof_join

# Each example runs real Spark jobs; keep the example counts small —
# these laws fail loudly when broken, they don't need wide sampling.
SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=50),  # version/time
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(target=rows, source=rows)
def test_merge_upsert_idempotent_and_unique(spark, target, source):
    """merge(merge(t, s), s) == merge(t, s); merged keys are unique."""
    t = dedup_latest(
        spark.createDataFrame(target, ["k", "v", "x"]), ["k"], ["v", "x"]
    )
    s = spark.createDataFrame(source, ["k", "v", "x"])
    once = merge_upsert(t, s, ["k"], source_order=["v", "x"])
    twice = merge_upsert(once, s, ["k"], source_order=["v", "x"])
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice
    keys = [r["k"] for r in once.select("k").collect()]
    assert len(keys) == len(set(keys))


@SETTINGS
@given(left=rows, right=rows)
def test_asof_join_equals_naive(spark, left, right):
    """The one-shuffle union/carry-forward as-of equals the naive
    join-filter-rownumber definition (strict inequality)."""
    # unique (key, time) on the right so "latest prior" is unambiguous
    l = spark.createDataFrame(  # noqa: E741
        [(k, t) for k, t, _ in left], ["k", "t"]
    ).withColumn("lid", F.monotonically_increasing_id())
    r = (
        spark.createDataFrame(right, ["k", "rt", "rv"])
        .groupBy("k", "rt")
        .agg(F.max("rv").alias("rv"))
    )
    got = (
        asof_join(
            l, r, on="k", left_time="t", right_time="rt",
            right_values=["rt", "rv"], strict=True,
        )
        .select("k", "t", "asof_rt", "asof_rv")
        .collect()
    )
    w = W.partitionBy("k", "t", "lid").orderBy(F.desc("rt"))
    naive = (
        l.join(r, on="k", how="left")
        .where(F.col("rt").isNull() | (F.col("rt") < F.col("t")))
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1))
        .select(
            "k", "t",
            F.col("rt").alias("asof_rt"), F.col("rv").alias("asof_rv"),
        )
        .collect()
    )
    # the naive LEFT join can lose rows whose only matches were
    # filtered; restore them as null matches
    naive_keys = {(x["k"], x["t"]) for x in naive}
    for row in l.collect():
        if (row["k"], row["t"]) not in naive_keys:
            naive.append({"k": row["k"], "t": row["t"], "asof_rt": None, "asof_rv": None})
    def norm(xs):
        none = -(10**9)
        return sorted(
            (
                x["k"],
                x["t"],
                none if x["asof_rt"] is None else x["asof_rt"],
                none if x["asof_rv"] is None else x["asof_rv"],
            )
            for x in xs
        )

    assert norm(got) == norm(naive)


@SETTINGS
@given(data=rows, n_salt=st.integers(min_value=1, max_value=8))
def test_salted_groupby_equals_plain(spark, data, n_salt):
    df = spark.createDataFrame(data, ["k", "v", "x"])
    got = salted_groupby(
        df, ["k"], {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("x", "max")},
        n_salt=n_salt,
    )
    want = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("x").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=15
    )
)
def test_connected_components_edges_share_label(spark, edges):
    nodes = spark.range(10).select(F.col("id"))
    e = spark.createDataFrame(edges or [(0, 0)], ["id_a", "id_b"])
    labels = connected_components(nodes, e)
    lab = {r["id"]: r["cluster_id"] for r in labels.collect()}
    for a, b in edges:
        assert lab[a] == lab[b], (a, b, lab)
    # every label is the minimum of its own cluster
    from collections import defaultdict

    clusters = defaultdict(list)
    for n, c in lab.items():
        clusters[c].append(n)
    for c, members in clusters.items():
        assert c == min(members)


# --- JSON-schema translation laws (pure Python — no Spark jobs) ---

_scalar_props = st.sampled_from(
    [
        {"type": ["null", "boolean"]},
        {"type": ["null", "integer"]},
        {"type": ["null", "integer"], "minimum": -(2**31), "maximum": 2**31 - 1},
        {"type": ["null", "integer"], "minimum": 0, "maximum": 2**16 - 1},
        {"type": ["null", "number"]},
        {"type": ["null", "number"], "multipleOf": 0.001},
        {"type": ["null", "string"]},
        {"type": ["null", "string"], "format": "date-time"},
        {"type": ["null", "string"], "format": "date"},
        {"type": ["null", "string"], "format": "binary"},
    ]
)

_props = st.recursive(
    _scalar_props,
    lambda inner: st.one_of(
        st.fixed_dictionaries(
            {"type": st.just(["null", "array"]), "items": inner}
        ),
        st.builds(
            lambda ps: {"type": ["null", "object"], "properties": ps},
            st.dictionaries(
                st.sampled_from(["a", "b", "c"]), inner, min_size=1, max_size=3
            ),
        ),
    ),
    max_leaves=6,
)


@settings(max_examples=200, deadline=None)
@given(prop=_props)
def test_jsonschema_translation_total_and_stable(prop):
    """Translation never raises, is deterministic, and re-translating
    its own discovery emission is a fixpoint (B->C->B->C = B->C)."""
    from s3_rds_bq_airflow_spark.ingest import (
        property_for_spark_type,
        spark_type_for_property,
    )

    t1 = spark_type_for_property(prop)
    assert t1 == spark_type_for_property(prop)
    emitted = property_for_spark_type(t1)
    t2 = spark_type_for_property(emitted)
    assert t2 == spark_type_for_property(property_for_spark_type(t2))


_int_types = st.sampled_from(["byte", "short", "int", "long"])
_num_types = st.sampled_from(["byte", "short", "int", "long", "float", "double"])
_dec_types = st.builds(
    lambda p, s: ("decimal", p, min(s, p)),
    st.integers(min_value=1, max_value=38),
    st.integers(min_value=0, max_value=10),
)


def _mk_type(spec):
    from pyspark.sql import types as T

    if isinstance(spec, tuple):
        return T.DecimalType(spec[1], spec[2])
    return {
        "byte": T.ByteType(),
        "short": T.ShortType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
    }[spec]


_INT_MAX = {
    "ByteType": 127,
    "ShortType": 32767,
    "IntegerType": 2**31 - 1,
    "LongType": 2**63 - 1,
}


@settings(max_examples=200, deadline=None)
@given(a=st.one_of(_num_types, _dec_types), b=st.one_of(_num_types, _dec_types))
def test_widening_is_symmetric_and_lossless_for_integers(a, b):
    """Schema-drift widening law: the widened type of {a, b} is
    order-independent, and whenever both sides are integer-or-decimal
    the result can represent the LARGEST value of any integer side —
    the silent-NULL overflow class (decimal(5,0) x long) can't exist."""
    from pyspark.sql import types as T

    from s3_rds_bq_airflow_spark.ingest.evolve import _widen

    ta, tb = _mk_type(a), _mk_type(b)
    w_ab = _widen(ta, tb, coerce_to_string=False)
    w_ba = _widen(tb, ta, coerce_to_string=False)
    assert w_ab == w_ba
    if isinstance(ta, T.DecimalType) and isinstance(tb, T.DecimalType):
        # integer digits are never sacrificed, even at the 38 cap —
        # dropping them would silently NULL overflowing values
        need_intd = max(ta.precision - ta.scale, tb.precision - tb.scale)
        assert w_ab.precision - w_ab.scale >= need_intd
    for side in (ta, tb):
        name = type(side).__name__
        if name not in _INT_MAX:
            continue
        top = _INT_MAX[name]
        if isinstance(w_ab, T.DecimalType):
            assert w_ab.precision - w_ab.scale >= len(str(top)), (
                f"{side} widened to {w_ab} cannot hold {top}"
            )
        elif isinstance(w_ab, (T.FloatType, T.DoubleType)):
            pass  # float widening is documented lossy-precision, never NULL
        else:
            assert _INT_MAX[type(w_ab).__name__] >= top


# ---- ordered_running (operators/rangebucket) ------------------------

ranked_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),     # id (tiebreak)
        st.integers(min_value=-1000, max_value=1000),   # value (ties likely)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


@SETTINGS
@given(data=ranked_rows, descending=st.booleans(), n_buckets=st.sampled_from([2, 3, 16]))
def test_ordered_running_equals_global_window(spark, data, descending, n_buckets):
    """The range-bucket gear must be bit-identical to the
    single-partition global window on ARBITRARY inputs — heavy ties,
    negatives, bucket counts above the distinct-value count, both
    directions. (The fixed-dataset oracles prove it on real tables;
    this proves the algebra has no tie/boundary hole.)"""
    from s3_rds_bq_airflow_spark.operators.rangebucket import ordered_running

    df = spark.createDataFrame(data, "id long, v long")
    got = {
        r["id"]: (int(r["cum"]), r["i"])
        for r in ordered_running(
            df,
            "v",
            "id",
            descending=descending,
            n_buckets=n_buckets,
            cum_col="cum",
            index_col="i",
        ).collect()
    }
    order = sorted(data, key=lambda r: ((-r[1] if descending else r[1]), r[0]))
    cum = 0
    for i, (rid, val) in enumerate(order, start=1):
        cum += val
        assert got[rid] == (cum, i), (rid, descending, n_buckets)


interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # start
        st.integers(min_value=0, max_value=200),  # length
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(lefts=interval_rows, rights=interval_rows, bin_seconds=st.sampled_from([7, 64, 1000]))
def test_interval_overlap_count_rank_equals_brute(spark, lefts, rights, bin_seconds):
    """The pair-free rank decomposition must equal the brute-force
    per-left overlap count on ARBITRARY well-formed intervals —
    zero-length spans, heavy endpoint ties, bins wider than the whole
    domain and far narrower than any interval. (The fixed-lattice
    unit test pins the tie boundaries; this proves there is no other
    boundary hole.)"""
    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_count_rank,
    )

    ldf = spark.createDataFrame(
        [(i, float(s), float(s + n)) for i, (s, n) in enumerate(lefts)],
        "lid long, s double, e double",
    )
    rdf = spark.createDataFrame(
        [(float(s), float(s + n)) for (s, n) in rights], "s2 double, e2 double"
    )
    got = {
        (r["lid"], r["n"])
        for r in interval_overlap_count_rank(
            ldf, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            key_cols=("lid",), count_col="n", bin_seconds=bin_seconds,
        ).collect()
    }
    want = {
        (i, sum(1 for (rs, rn) in rights if s < rs + rn and rs < s + n))
        for i, (s, n) in enumerate(lefts)
    }
    assert got == want


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),   # doc_id (collisions fine: tie-broken by sort stability? no — keep unique via enumerate below)
        st.integers(min_value=1, max_value=120),  # n_tokens
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(docs=pack_rows, n_shards=st.sampled_from([1, 3, 8]), capacity=st.sampled_from([64, 128, 4096]))
def test_greedy_pack_sharded_law(spark, docs, n_shards, capacity):
    """On arbitrary weights/capacities: every pack respects the hard
    cap except singletons, ids are contiguous from 0 within each
    (group, shard), and the sharded result equals a sequential
    first-fit replay of each shard — for ANY shard count including
    the unsharded proof gear."""
    from s3_rds_bq_airflow_spark.operators.packing import greedy_pack

    data = [(i, "g%d" % (w % 2), w) for i, (_, w) in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id long, grp string, n_tokens long")
    kw = dict(capacity=capacity, weight_col="n_tokens", order_col="doc_id",
              group_cols=("grp",))
    if n_shards > 1:
        kw.update(n_shards=n_shards, shard_key="doc_id")
    packed = greedy_pack(df, **kw).collect()
    assert len(packed) == len(data)
    # replay
    groups = {}
    for (i, g, w) in data:
        sh = i % n_shards if n_shards > 1 else 0
        groups.setdefault((g, sh), []).append((i, w))
    expect = {}
    for key, items in groups.items():
        items.sort()
        pid, total = 0, 0
        for i, w in items:
            if total > 0 and total + w > capacity:
                pid, total = pid + 1, 0
            expect[i] = pid
            total += w
    for r in packed:
        assert r["pack_id"] == expect[r["doc_id"]], (r, n_shards, capacity)


@SETTINGS
@given(
    rows=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True),
    k=st.sampled_from([1, 5, 40]),
    width=st.sampled_from([1, 4, 16]),
)
def test_bottom_k_by_md5_law(spark, rows, k, width):
    """Two-phase capped selection == plain sorted bottom-k for any
    (k, salt width), including k above the group size."""
    from s3_rds_bq_airflow_spark.queries._util import bottom_k_by_md5

    import hashlib

    data = [(rid, rid % 3) for rid in rows]
    df = spark.createDataFrame(data, "rid long, g int")
    got = sorted(
        (r["g"], r["rid"])
        for r in bottom_k_by_md5(
            df, group_cols=("g",), id_col="rid", k=k, salt_width=width
        ).collect()
    )
    by_group = {}
    for rid, g in data:
        by_group.setdefault(g, []).append(rid)
    want = sorted(
        (g, rid)
        for g, ids in by_group.items()
        for rid in sorted(ids, key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x))[:k]
    )
    assert got == want


@SETTINGS
@given(
    qvals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=20),
    pvals=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=30),
    ties_count=st.booleans(),
    bin_seconds=st.sampled_from([3, 64]),
)
def test_merge_count_equals_brute_rank(spark, qvals, pvals, ties_count, bin_seconds):
    """_merge_count == the literal rank definition on arbitrary values
    with heavy ties, negatives (negative bins exercise floor
    semantics), and empty point sets — under both tie modes."""
    from s3_rds_bq_airflow_spark.operators.temporal import _merge_count

    q = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(qvals)], "qid long, v double"
    )
    p = spark.createDataFrame(
        [(float(v),) for v in pvals], "pv double"
    ) if pvals else spark.createDataFrame([], "pv double")
    got = {
        (r["qid"], r["n"])
        for r in _merge_count(
            q, F.col("v"), p, F.col("pv"),
            key_cols=("qid",), count_col="n",
            ties_count=ties_count, bin_seconds=bin_seconds,
        ).collect()
    }
    want = {
        (i, sum(1 for x in pvals if (x <= v if ties_count else x < v)))
        for i, v in enumerate(qvals)
    }
    assert got == want


@SETTINGS
@given(lefts=interval_rows, rights=interval_rows, bucket=st.sampled_from([7, 64, 1000]))
def test_interval_overlap_join_binned_equals_brute_pairs(spark, lefts, rights, bucket):
    """The binned PAIR operator must emit exactly the brute-force
    overlap pairs, as a MULTISET (duplicate input intervals yield
    duplicate pairs, no distinct-collapse), for arbitrary intervals
    including zero-length ones and any bucket width."""
    from collections import Counter

    from s3_rds_bq_airflow_spark.operators.temporal import (
        interval_overlap_join_binned,
    )

    ldf = spark.createDataFrame(
        [(i, float(s), float(s + n)) for i, (s, n) in enumerate(lefts)],
        "lid long, s double, e double",
    )
    rdf = spark.createDataFrame(
        [(j, float(s), float(s + n)) for j, (s, n) in enumerate(rights)],
        "rid long, s2 double, e2 double",
    )
    got = Counter(
        (r["lid"], r["rid"])
        for r in interval_overlap_join_binned(
            ldf, rdf,
            left_start=F.col("s"), left_end=F.col("e"),
            right_start=F.col("s2"), right_end=F.col("e2"),
            bucket_seconds=bucket,
        ).collect()
    )
    want = Counter(
        (i, j)
        for i, (ls, ln) in enumerate(lefts)
        for j, (rs, rn) in enumerate(rights)
        if ls < rs + rn and rs < ls + ln
    )
    assert got == want


set_family = st.lists(
    st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=10),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(sets=set_family, tau=st.sampled_from([(1, 2), (3, 10), (9, 10), (1, 1)]))
def test_setsim_join_equals_brute_jaccard(spark, sets, tau):
    """PPJoin (prefix filter + length filter + verify) must emit
    EXACTLY the brute-force Jaccard-threshold pairs on arbitrary set
    families — tiny overlapping universes make prefix collisions and
    boundary thresholds (tau = 1 exact-duplicates gear included)
    maximally likely, the regime where an off-by-one in the prefix
    length silently drops pairs."""
    from fractions import Fraction

    from s3_rds_bq_airflow_spark.operators.setsim import setsim_join

    tau_num, tau_den = tau
    elems = spark.createDataFrame(
        [(i, h) for i, s in enumerate(sets) for h in s], "_id long, _h long"
    )
    got = {
        (r["id_a"], r["id_b"], r["n_inter"], r["n_union"])
        for r in setsim_join(elems, tau_num, tau_den).collect()
    }
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter and Fraction(inter, union) >= Fraction(tau_num, tau_den):
                want.add((i, j, inter, union))
    assert got == want
