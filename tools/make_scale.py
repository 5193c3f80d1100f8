"""Build a stride-shifted scaled replica of a testdata SF directory.

Promotes the round-5 /tmp/sf1 recipe (docs/BENCH_NOTES.md, "sf1 scale
step") into a checked-in tool: every table is replicated ``--copies``
times with each entity id shifted by ``copy_index * stride`` — the
SAME stride on BOTH sides of every join key family (custkey appears in
customer AND orders, orderkey in orders AND lineitem, ...) — so join
fanout and group cardinality grow like real data growth instead of
piling onto the same keys. Dimension tables (region, nation) are
copied once, unshifted, and every fact row keeps its original
nationkey — at 100 TB those stay broadcast-sized dims.

Content tables (documents, embeddings) additionally get a
deterministic per-copy content perturbation (word de-interleave /
component rotation) so texts and vectors don't replicate verbatim —
verbatim clones would pile `copies` identical items into the same
minhash/LSH buckets and hand every content-similarity operator a
quadratic clone-pair blowup real growth never produces.

Copy 0 keeps original keys and content, so the scaled directory is a
superset of the source. Output preserves the source's physical parquet schema
(including the events table's TIMESTAMP(NANOS) ts column) by writing
through pyarrow with format version 2.6 and streams one copy at a
time, so building sf10 (100x sf0.1) never holds more than one source
table in memory.

Usage:
    python tools/make_scale.py --src /root/testdata/sf0.1 \
        --dest /tmp/sf1 --copies 10
    python tools/compare.py --sf /tmp/sf1          # parity at scale
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py    # perf at scale
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Copied once, unshifted: broadcast-sized dimensions at any scale.
COPY_ONCE = ("region", "nation")

# column -> key family; every column in a family shifts by the same
# stride so equi-joins keep matching within a copy and never across.
FAMILY = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def family_strides(src: str) -> dict[str, int]:
    """Per-family stride: the next power of ten above the family's max
    key across ALL columns carrying it (so shifted ranges never
    collide between copies)."""
    fam_max: dict[str, int] = {}
    for t in TABLES:
        path = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        schema = pq.read_schema(path)
        cols = [c for c in schema.names if c in FAMILY]
        if not cols:
            continue
        tbl = pq.read_table(path, columns=cols)
        for c in cols:
            m = pc.max(tbl[c]).as_py()
            if m is not None:
                fam = FAMILY[c]
                fam_max[fam] = max(fam_max.get(fam, 0), int(m))
    strides = {}
    for fam, m in fam_max.items():
        s = 10
        while s <= m:
            s *= 10
        strides[fam] = s
    return strides


def shifted(tbl: pa.Table, k: int, strides: dict[str, int]) -> pa.Table:
    if k == 0:
        return tbl
    for i, name in enumerate(tbl.column_names):
        fam = FAMILY.get(name)
        if fam is None:
            continue
        col = tbl.column(i)
        typ = col.type
        add = pa.scalar(k * strides[fam], type=typ)
        tbl = tbl.set_column(i, name, pc.cast(pc.add(col, add), typ))
    return tbl


# -- content decorrelation -------------------------------------------------
#
# Key strides keep JOIN fanout realistic, but CONTENT replicated
# verbatim is its own scale disease: every text/embedding appearing
# `copies` times piles clones into the same minhash/simhash/LSH
# buckets, so content-similarity operators face a quadratic
# clone-pair blowup (bucket pair volume ~ copies^2 per original row)
# that real growth — mostly NEW content plus the usual within-corpus
# duplication — never produces. Each copy k>0 therefore gets a
# deterministic content perturbation: copy 0 keeps the originals
# (with their planted twins) bit-for-bit, and every copy remains an
# internally-isomorphic corpus, so per-copy duplicate/near-dup
# structure still scales linearly like the other tables.


def _perturb_words(words: list, k: int) -> list:
    # Two deterministic moves, each killing one similarity channel
    # verbatim replication leaves wide open:
    #  1. k applications of the de-interleave permutation scatter word
    #     ADJACENCY, so shingle / n-gram / minhash overlap across
    #     copies collapses;
    #  2. every 3rd word gets the copy index appended, so the token
    #     MULTISET also diverges (~33%) — without this, bag-of-words
    #     operators (SimHash votes, set-similarity token sets) see
    #     every doc `copies` times and their pair outputs go quadratic
    #     (the round-6 sweep measured 120x pairs for 10x data).
    # Token COUNT per doc is preserved, so length/packing/chunking
    # distributions still scale linearly and realistically.
    for _ in range(k):
        words = words[::2] + words[1::2]
    tag = str(k)
    return [w + tag if i % 3 == 0 else w for i, w in enumerate(words)]


def perturb_documents(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    out = [
        None if t is None else " ".join(_perturb_words(t.split(" "), k))
        for t in texts
    ]
    tbl = tbl.set_column(
        tbl.column_names.index("text"), "text", pa.array(out, pa.string())
    )
    if "n_chars" in tbl.column_names:
        n = [None if t is None else len(t) for t in out]
        idx = tbl.column_names.index("n_chars")
        tbl = tbl.set_column(
            idx, "n_chars", pc.cast(pa.array(n), tbl.column(idx).type)
        )
    return tbl


def perturb_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    # rotate each vector's components by a per-copy offset: norms and
    # per-dimension value distributions are preserved, but directions
    # decorrelate across copies (cosine ~ random), so LSH/IVF buckets
    # spread instead of stacking `copies` identical vectors
    idx = tbl.column_names.index("embedding")
    col = tbl.column(idx)
    typ = col.type
    vecs = col.to_pylist()
    out = []
    for v in vecs:
        if v is None or len(v) == 0:
            out.append(v)
            continue
        r = (k * 7) % len(v)
        out.append(v[r:] + v[:r])
    return tbl.set_column(idx, "embedding", pa.array(out, typ))


PERTURB = {"documents": perturb_documents, "embeddings": perturb_embeddings}


def build(src: str, dest: str, copies: int, tables: tuple[str, ...] = TABLES) -> None:
    os.makedirs(dest, exist_ok=True)
    strides = family_strides(src)
    print(f"strides: {strides}")
    for t in tables:
        spath = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(spath):
            continue
        tbl = pq.read_table(spath)
        dpath = os.path.join(dest, f"{t}.parquet")
        n = 1 if t in COPY_ONCE else copies
        perturb = PERTURB.get(t, lambda x, k: x)
        with pq.ParquetWriter(dpath, tbl.schema, version="2.6") as w:
            for k in range(n):
                w.write_table(perturb(shifted(tbl, k, strides), k))
        print(f"{t}: {tbl.num_rows} x {n} -> {dpath}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=list(TABLES),
        help="subset of tables to build (e.g. a perf-only step that "
        "exercises just the documents-based operators)",
    )
    args = ap.parse_args()
    build(args.src, args.dest, args.copies, tuple(args.tables))


if __name__ == "__main__":
    main()
