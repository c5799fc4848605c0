#!/usr/bin/env python3
"""Synthesize an N-times scale fixture from sf0.1 by key-offset replication
(the round-7 sf1 method, kept identical so ratios compare across rounds):
every id space is offset by replica * stride (strides = max key + 1 per id
space, shared across tables so referential integrity is preserved exactly);
region/nation dims and all CONTENT columns (names, texts, embeddings) are
replicated unchanged. Consequence to keep in mind when reading per-query
ratios: every document/name has N identical copies, so similarity PAIR sets
grow ~C(N,2) by construction — output-bound queries inherit that curve from
the method, not from the plan.

Usage: python3 tools/synth_scale.py <N> <outDir> [perturb] [tables=a,b,...]
  e.g. python3 tools/synth_scale.py 100 /tmp/sf10
       python3 tools/synth_scale.py 100 /tmp/sf10p perturb
       python3 tools/synth_scale.py 1000 /tmp/sf100p perturb tables=documents
`tables=` restricts synthesis to the named tables (the sf100 probe only
needs documents for the MinHash/manifest families — a full 1000x fixture
would spend most of its disk on lineitem rows no probed face reads).

`perturb` mode addresses the caveat above for the pair-similarity family:
every token of every replicated document (and the customer/supplier name
spaces) is salted with the replica index, so replicas of one doc are NOT
near-dups of each other — each replica reproduces sf0.1's within-replica
pair structure and nothing across replicas. Under perturb, pair outputs
grow ~N (linear), matching real corpora where 100x more data is new data,
not 100 identical copies; compute/shuffle scaling can then be read without
the C(N,2) output-bound term.

perturb also TIME-EXTENDS events: replica i's timestamps shift by
i * (fixture span + 1h), so N× events cover an N× longer history at the
SAME per-hour density, instead of stacking N identical copies of one month
into itself. The plain mode's same-window stacking makes every per-bin
population N× denser, which drives time-windowed JOIN state probes and
pair outputs quadratic BY FIXTURE CONSTRUCTION (the streaming interval
join at plain sf10 probes 100×-dense bins for 10,000× the pairs — a
shape no real 100 TB corpus has); the extended timeline is the realistic
"more data = longer history" scale axis for sessionization, windowed aggs,
and interval joins.
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"


def main(n, out, perturb=False, tables=None):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    import os
    os.makedirs(out, exist_ok=True)
    wanted = set(tables.split(",")) if tables else None

    def stride(table, col):
        return con.execute(
            f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

    ok = stride("orders", "o_orderkey")
    ck = stride("customer", "c_custkey")
    pk = stride("part", "p_partkey")
    sk = stride("supplier", "s_suppkey")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")
    ek = stride("events", "event_id")
    uk = stride("events", "user_id")

    def rep(table, select):
        if wanted is not None and table not in wanted:
            return
        con.execute(
            f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet', "
            f"range({n}) r(i)) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(table, con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0])

    rep("lineitem",
        f"l_orderkey + i * {ok} AS l_orderkey, "
        f"l_partkey + i * {pk} AS l_partkey, "
        f"l_suppkey + i * {sk} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate")
    rep("orders",
        f"o_orderkey + i * {ok} AS o_orderkey, "
        f"o_custkey + i * {ck} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    rep("customer",
        f"c_custkey + i * {ck} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
    rep("part",
        f"p_partkey + i * {pk} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice")
    rep("supplier",
        f"s_suppkey + i * {sk} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    if perturb:
        # Salt EVERY token with the replica index: all shingles/grams become
        # replica-local, so cross-replica similarity is exactly zero and the
        # pair family's output scales linearly in N. n_chars tracks the new
        # text so length-derived stats stay self-consistent.
        rep("documents",
            f"doc_id + i * {dk} AS doc_id, "
            "array_to_string(list_transform(string_split(text, ' '), "
            "t -> t || 'r' || i), ' ') AS text, lang, source, "
            "length(array_to_string(list_transform(string_split(text, ' '), "
            "t -> t || 'r' || i), ' ')) AS n_chars")
        # Orthogonal per-replica rotation analog: negate a replica-indexed
        # dimension pattern so replicated vectors are no longer identical
        # (cosine(v, v') < 1 across replicas) while norms are preserved.
        rep("embeddings",
            f"vec_id + i * {vk} AS vec_id, "
            "list_transform(embedding, (x, j) -> "
            "CASE WHEN (j - 1 + i) % 7 = 0 AND i > 0 THEN -x ELSE x END) "
            "AS embedding, label")
    else:
        rep("documents",
            f"doc_id + i * {dk} AS doc_id, text, lang, source, n_chars")
        rep("embeddings",
            f"vec_id + i * {vk} AS vec_id, embedding, label")
    if perturb:
        span_us = con.execute(
            f"SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + 3600000000 "
            f"FROM '{SRC}/events.parquet'").fetchone()[0]
        rep("events",
            f"event_id + i * {ek} AS event_id, "
            f"ts + to_microseconds(CAST(i AS BIGINT) * {span_us}) AS ts, "
            f"user_id + i * {uk} AS user_id, event_type, value, props")
    else:
        rep("events",
            f"event_id + i * {ek} AS event_id, ts, "
            f"user_id + i * {uk} AS user_id, event_type, value, props")
    for t in ("nation", "region"):
        if wanted is not None and t not in wanted:
            continue
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")


if __name__ == "__main__":
    args = sys.argv[3:]
    main(int(sys.argv[1]), sys.argv[2],
         "perturb" in args,
         next((a.split("=", 1)[1] for a in args if a.startswith("tables=")),
              None))
